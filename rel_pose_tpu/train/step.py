"""Jitted train/eval steps with data-parallel shardings.

The per-batch body of the reference's hot loop
(``/root/reference/train.py:140-166``) — forward, geodesic loss
(w_tr * L_tr + w_rot * L_rot), backward, clip, Adam step — compiled into ONE
XLA program.  Data parallelism comes from NamedShardings on the jitted
function (params replicated, batch sharded over the 'data' mesh axis); XLA
emits the gradient all-reduce over ICI, replacing DDP/NCCL.

The train state is donated, so parameter/optimizer buffers are updated
in place on device.
"""

import jax
import jax.numpy as jnp

from ..geom.losses import geodesic_loss
from ..models.vitess import vitess_forward
from ..ops.runtime import data_parallel_scope
from .state import TrainState


def make_loss_fn(cfg, w_tr, w_rot, train_val="train", remat=False):
    if remat:
        # rematerialize the forward under grad: trades recompute FLOPs for
        # activation memory, enabling much larger per-chip batches.
        # cfg/training are closed over (jax.checkpoint statics only cover
        # positional args in this jax version).
        def fwd(params, bn_state, images, intrinsics, Gs, training):
            inner = jax.checkpoint(
                lambda p, s, im, K, G: vitess_forward(
                    p, s, cfg, im, K, Gs=G, training=training))
            return inner(params, bn_state, images, intrinsics, Gs)
    else:
        def fwd(params, bn_state, images, intrinsics, Gs, training):
            return vitess_forward(params, bn_state, cfg, images, intrinsics,
                                  Gs=Gs, training=training)

    def loss_fn(params, bn_state, images, poses_gt, intrinsics, training):
        Gs = jnp.zeros_like(poses_gt).at[..., 6].set(1.0)
        poses_est, new_bn = fwd(params, bn_state, images, intrinsics, Gs,
                                training)
        loss_tr, loss_rot, metrics = geodesic_loss(poses_gt, poses_est,
                                                   train_val)
        loss = w_tr * loss_tr + w_rot * loss_rot
        return loss, (new_bn, metrics, poses_est)
    return loss_fn


def make_train_step(cfg, tx, w_tr=10.0, w_rot=10.0, mesh=None, remat=False):
    """Returns a jitted ``(state, images, poses, intrinsics) ->
    (state, metrics, poses_est)`` function.

    With ``mesh`` provided, inputs are expected batch-sharded over 'data' and
    the state replicated; without it, plain single-device jit.
    ``remat`` rematerializes the forward in the backward pass (larger
    per-chip batches at ~1.3x step FLOPs).
    """
    loss_fn = make_loss_fn(cfg, w_tr, w_rot, "train", remat=remat)

    def step(state: TrainState, images, poses_gt, intrinsics):
        # the scope makes the fused Pallas ops partition themselves over
        # 'data' via shard_map (GSPMD cannot see inside a Mosaic custom
        # call); it is live for the whole trace, forward AND backward
        with data_parallel_scope(mesh):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (new_bn, metrics, poses_est)), grads = grad_fn(
                state.params, state.bn_state, images, poses_gt, intrinsics,
                True)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(params=new_params, bn_state=new_bn,
                                  opt_state=new_opt, step=state.step + 1)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics, poses_est

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, data, data),
            out_shardings=(repl, repl, data),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(cfg, w_tr=10.0, w_rot=10.0, mesh=None, train_val="val"):
    """Validation step: forward + loss, no updates, BN in eval mode
    (reference ``model.eval()`` + ``torch.no_grad``, train.py:136-153)."""
    loss_fn = make_loss_fn(cfg, w_tr, w_rot, train_val)

    def step(state: TrainState, images, poses_gt, intrinsics):
        with data_parallel_scope(mesh):
            loss, (_, metrics, poses_est) = loss_fn(
                state.params, state.bn_state, images, poses_gt, intrinsics,
                False)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics, poses_est

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(repl, data, data, data),
                       out_shardings=(repl, data))
    return jax.jit(step)


def make_forward_fn(cfg, mesh=None, training=False):
    """Jitted inference forward: (params, bn_state, images, intrinsics) ->
    (B, 2, 7) poses.  Used by the eval/demo CLIs and the benchmark."""
    def fwd(params, bn_state, images, intrinsics):
        with data_parallel_scope(mesh):
            poses, _ = vitess_forward(params, bn_state, cfg, images,
                                      intrinsics, training=training)
        return poses

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(fwd, in_shardings=(repl, repl, data, data),
                       out_shardings=data)
    return jax.jit(fwd)
