"""Optimizer + LR schedule (optax), matching the reference's recipe.

Reference (``/root/reference/train.py:69-73,158-166``):
  * Adam(lr, weight_decay=1e-5) — torch Adam's weight_decay is L2 added to
    the gradient BEFORE the moment update (not AdamW), reproduced here with
    ``optax.add_decayed_weights`` ahead of ``scale_by_adam``;
  * OneCycleLR(max_lr, total_steps, pct_start=warmup/steps, div_factor=25,
    cycle_momentum=False) with the default cosine annealing and
    final_div_factor=1e4 — reproduced torch-exactly by ``onecycle_schedule``
    below (NOT ``optax.cosine_onecycle_schedule``, whose peak lands one step
    later and whose warmup ramp is linear — found by the training-trajectory
    parity test, see ``onecycle_schedule``'s docstring);
  * gradient clipping by global norm 2.5 applied before the update.
"""

import jax.numpy as jnp
import optax


def warm_start_adam(opt_state, mu, nu, count):
    """Inject converted torch Adam moments into an optax chain state.

    ``mu``/``nu`` are pytrees shaped like the params (from
    ``utils.convert.convert_torch_adam_state``); ``count`` is the torch
    per-param step, which drives the same bias correction in
    ``scale_by_adam``.  The schedule count (and everything else in the chain)
    is left untouched — the reference's ``--ckpt`` warm start also restores
    the optimizer but starts the scheduler fresh
    (``/root/reference/train.py:75-86``).
    """
    new = []
    replaced = False
    for s in opt_state:
        if isinstance(s, optax.ScaleByAdamState):
            s = optax.ScaleByAdamState(
                count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu)
            replaced = True
        new.append(s)
    if not replaced:
        raise ValueError("no ScaleByAdamState found in optimizer state")
    return tuple(new)


def onecycle_schedule(lr, steps, warmup):
    """torch-exact OneCycleLR('cos'), NOT optax.cosine_onecycle_schedule.

    torch places the phase boundary at ``pct_start*total_steps - 1`` update
    indices (peak lr at update ``warmup-1``) and cosine-anneals BOTH phases;
    optax's version peaks one step later and ramps the warmup linearly.  The
    drift is ~1e-4 relative at the production 10k/120k schedule, but the
    N-step trajectory-parity test against torch's own OneCycleLR
    (``tests/test_reference_parity.py``) resolves it: update k must use
    exactly torch's lr(k).
    """
    init = lr / 25.0
    final = init / 1e4
    # torch places the boundary at pct_start*total_steps - 1; warmup <= 1
    # degenerates to "update 0 is already at peak lr" (torch itself rejects
    # pct_start outside (0, 1), so warmup=0 has no torch counterpart — we
    # treat it like warmup=1)
    w_end = float(max(warmup - 1, 0))
    a_len = float(steps - 1) - w_end
    no_warmup = warmup <= 1

    def sched(count):
        # half-angle forms (sin^2 / cos^2) instead of (1 -+ cos)/2: the
        # latter cancels catastrophically in fp32 at the ~1e-8 tail lrs
        s = jnp.asarray(count, jnp.float32)
        if no_warmup:
            wp = jnp.ones_like(s)       # lr(0) = peak lr, no ramp
        else:
            wp = jnp.clip(s / w_end, 0.0, 1.0)
        up = init + (lr - init) * jnp.square(jnp.sin(0.5 * jnp.pi * wp))
        ap = jnp.clip((s - w_end) / jnp.maximum(a_len, 1.0), 0.0, 1.0)
        down = final + (lr - final) * jnp.square(jnp.cos(0.5 * jnp.pi * ap))
        return jnp.where(s <= w_end, up, down)

    return sched


def make_optimizer(lr=5e-4, steps=120000, warmup=10000, weight_decay=1e-5,
                   clip=2.5):
    """Returns (optax optimizer, schedule fn)."""
    schedule = onecycle_schedule(lr, steps, warmup)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),  # includes the -1 sign
    )
    return tx, schedule
