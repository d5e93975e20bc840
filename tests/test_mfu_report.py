"""Pin the perf-denominator arithmetic (``scripts/mfu_report.py``).

The round-5 "X% of floor" claims in docs/PROFILE.md rest on the MAC
formulas in that script; this cross-checks them against the abstract-trace
matmul FLOP counter (``utils/profiling.estimate_step_flops``) that the
training loop's MFU logging also uses, so the two published denominators
cannot silently diverge from the model's actual math.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp

from rel_pose_tpu.ops.pallas_essential_block import essential_block_reference
from rel_pose_tpu.ops.pallas_vit import stack_block_params, vit_stack_reference
from rel_pose_tpu.utils.profiling import estimate_step_flops

from test_pallas_vit import make_blocks

_SPEC = importlib.util.spec_from_file_location(
    "mfu_report",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "mfu_report.py"))
mfu = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(mfu)


def test_pad():
    assert mfu.pad(64) == 128
    assert mfu.pad(128) == 128
    assert mfu.pad(129) == 256
    assert mfu.pad(512) == 512
    assert mfu.pad(576) == 640  # 3C=576 is 4.5 tiles -> the 1.11x qkv tax


def test_vit_block_flops_match_abstract_trace():
    """2 * vit_block_macs(real) must equal the traced matmul FLOPs of the
    unfused ViT stack, exactly — this is the eval/train MFU numerator's
    per-block content and the ViT megakernel's REAL-MAC floor."""
    depth, dim, heads, G, N = 2, 96, 3, 4, 64
    stacked = stack_block_params(make_blocks(depth, dim, heads))
    sd = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                      stacked)
    x = jax.ShapeDtypeStruct((G, N, dim), jnp.float32)
    traced = estimate_step_flops(
        lambda s, xx: vit_stack_reference(xx, s, depth, heads), sd, x)
    formula = 2 * depth * G * mfu.vit_block_macs(N, dim, heads, 4 * dim,
                                                 False)
    assert traced == formula, (traced, formula)


def test_essential_block_flops_bound_abstract_trace():
    """essential_block_macs counts the KERNEL's scheduled matmuls
    (A @ [va|vb] then v^T(Av), both 2e wide — ``_eb_combos``), which is
    deliberately MORE than the minimal einsum factorization the abstract
    trace counts ((e,N)@(N,N) then @(N,e) per direction).  Pin the
    relationship: formula >= trace (a kernel cannot beat the minimal
    math) and < 2x (no double-counted stage)."""
    B, N, C, heads, pos = 2, 64, 96, 3, 6
    qkv = jax.ShapeDtypeStruct((B, N, 3 * C), jnp.float32)
    posit = jax.ShapeDtypeStruct((B, N, 6), jnp.float32)
    traced = estimate_step_flops(
        lambda a, b, p: essential_block_reference(a, b, p, heads),
        qkv, qkv, posit)
    # the reference takes qkv precomputed; drop the formula's qkv term
    formula = (2 * B * mfu.essential_block_macs(N, C, heads, pos, False)
               - 2 * B * (2 * N * C * 3 * C))
    assert traced <= formula < 2 * traced, (traced, formula)


def test_batch_override_requires_fresh_times():
    """Overriding --eval_batch/--train_batch without fresh --*_ms must be
    refused: the default times are the batch-256/-60 hardware record, and
    rescaled FLOPs over record times would print silently-wrong MFU."""
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, _SPEC.origin, "--eval_batch", "512"],
        capture_output=True, text=True)
    assert r.returncode != 0
    assert "batch-256 hardware record" in (r.stderr + r.stdout)


def test_padded_floor_dominates_real():
    for fn, args in ((mfu.vit_block_macs, (576, 192, 3, 768)),
                     (mfu.essential_block_macs, (576, 192, 3, 6))):
        real = fn(*args, False)
        padded = fn(*args, True)
        assert padded > real
        # production pad tax is bounded (d=64 -> 2x is the worst dim)
        assert padded < 2.2 * real
