"""Perf denominator: MFU + MXU-time floors for the production shapes.

Answers "6,371 pairs/s of WHAT ceiling?" (VERDICT r4 item 2) with
arithmetic instead of attribution:

  * whole-step MFU for the eval forward (batch 256, bf16) and the train
    step (batch 60, both dtypes), from the same abstract-trace matmul/conv
    FLOP counter the training loop logs (``utils/profiling.py``; the
    fused Pallas kernels compute identical math, so the unfused trace is
    the model's FLOP content);
  * the ViT megakernel's MXU-time floor, counted twice: REAL MACs (the
    architecture's math) and PADDED-TILE MACs — every matmul dimension
    rounded up to the 128-lane MXU tile the v5e actually schedules, which
    is where the reference architecture's d=64 heads and C=192 embeddings
    (``/root/reference/src/model.py:19-23``) burn lanes no kernel can
    reclaim without changing the model;
  * same floors for the essential/cross block's bilinear contractions.

Measured times default to the hardware record (see docs/PROFILE.md) and
are overridable, so the report can be re-derived after any re-bench:

    python scripts/mfu_report.py                       # record numbers
    python scripts/mfu_report.py --eval_ms 40.2 ...    # fresh numbers

Runs on CPU (abstract tracing only, no compile, no device math).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RELPOSE_PLATFORM", "cpu")

PEAK = 197e12  # v5e bf16 MXU peak FLOP/s; both modes run matmuls at the
               # backend-default (bf16-class) MXU precision (docs/PROFILE.md)


def pad(v, m=128):
    return -(-v // m) * m


def vit_block_macs(N, C, heads, hidden, padded):
    """Per-sequence MACs of one ViT block, optionally at 128-padded tile
    shapes.  Matmuls: qkv (N,C,3C), per-head QK^T (N,d,N) and AV (N,N,d),
    proj (N,C,C), MLP fc1 (N,C,4C) + fc2 (N,4C,C)."""
    d = C // heads
    f = pad if padded else (lambda v: v)
    return (N * f(C) * f(3 * C)                 # qkv projection
            + heads * N * f(d) * f(N)           # QK^T  (contraction dim d)
            + heads * N * f(N) * f(d)           # AV    (output dim d)
            + N * f(C) * f(C)                   # attention out-proj
            + N * f(C) * f(hidden)              # MLP fc1
            + N * f(hidden) * f(C))             # MLP fc2


def essential_block_macs(N, C, heads, pos, padded):
    """Per-PAIR MACs of the essential/cross block: qkv on both images,
    then per direction x head QK^T (N,d,N), AV over va|vb (+pos columns),
    and the (d+pos, N) x (N, d+pos) moment contraction v^T (A v)."""
    d = C // heads
    e = d + pos
    f = pad if padded else (lambda v: v)
    qkv = 2 * N * f(C) * f(3 * C)
    per_combo = (N * f(d) * f(N)                # QK^T
                 + N * f(N) * f(2 * e)          # A @ [va|vb]
                 + e * f(N) * f(2 * e))         # v^T (Av) moment matrices
    return qkv + 2 * heads * per_combo


def fmt(flops):
    return f"{flops / 1e12:.3f} TFLOP"


def line(stage, measured_ms, floor_flops):
    floor_ms = floor_flops / PEAK * 1e3
    pct = floor_ms / measured_ms * 100
    print(f"  {stage:<34} {measured_ms:7.2f} ms   floor {floor_ms:6.2f} ms"
          f"   -> {pct:5.1f}% of floor")
    return floor_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval_batch", type=int, default=256)
    ap.add_argument("--train_batch", type=int, default=60)
    # hardware record, v5e (docs/PROFILE.md; eval step = batch/pairs_per_s).
    # Defaults are None so a batch override without matching fresh
    # measurements can be detected (the record times are batch-specific).
    ap.add_argument("--eval_ms", type=float, default=None)
    ap.add_argument("--train_fp32_ms", type=float, default=None)
    ap.add_argument("--train_bf16_ms", type=float, default=None)
    ap.add_argument("--vit_eval_ms", type=float, default=None,
                    help="ViT megakernel share of the eval step "
                         "(scripts/bench_stages.py)")
    ap.add_argument("--cross_eval_ms", type=float, default=None)
    args = ap.parse_args()

    # fill record defaults, refusing to mix them with a changed batch —
    # FLOP numerators scale with batch but the record times do not
    eval_defaults = {"eval_ms": 256 / 6371.4 * 1e3, "vit_eval_ms": 18.9,
                     "cross_eval_ms": 4.8}
    train_defaults = {"train_fp32_ms": 56.8, "train_bf16_ms": 41.51}
    for batch, record_at, defaults in (
            (args.eval_batch, 256, eval_defaults),
            (args.train_batch, 60, train_defaults)):
        missing = [k for k in defaults if getattr(args, k) is None]
        if batch != record_at and missing:
            sys.exit(f"ERROR: the default --{'/--'.join(missing)} are the "
                     f"batch-{record_at} hardware record; pass fresh "
                     f"measurements when overriding the batch to {batch}")
        for k in missing:
            setattr(args, k, defaults[k])

    import jax
    import jax.numpy as jnp
    from rel_pose_tpu.config import ModelConfig
    from rel_pose_tpu.models import vitess_init, vitess_forward
    from rel_pose_tpu.train.step import make_loss_fn
    from rel_pose_tpu.utils.profiling import estimate_step_flops

    cfg = ModelConfig(compute_dtype="bfloat16")
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    sd = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                      (params, bn_state))

    B = args.eval_batch
    eval_flops = estimate_step_flops(
        lambda p, s, im, ii: vitess_forward(p, s, cfg, im, ii,
                                            training=False)[0],
        sd[0], sd[1],
        jax.ShapeDtypeStruct((B, 2, 3, 384, 512), jnp.uint8),
        jax.ShapeDtypeStruct((B, 2, 4), jnp.float32))

    lf = make_loss_fn(cfg, 10.0, 10.0, "train")
    T = args.train_batch
    train_flops = estimate_step_flops(
        lambda p, s, im, po, ii: jax.value_and_grad(lf, has_aux=True)(
            p, s, im, po, ii, True),
        sd[0], sd[1],
        jax.ShapeDtypeStruct((T, 2, 3, 384, 512), jnp.uint8),
        jax.ShapeDtypeStruct((T, 2, 7), jnp.float32),
        jax.ShapeDtypeStruct((T, 2, 4), jnp.float32))
    if eval_flops is None or train_flops is None:
        # estimate_step_flops deliberately returns None on trace failure
        # (the train loop must not crash on a logging estimate); here the
        # estimate IS the product, so surface the failure loudly
        sys.exit("ERROR: abstract-trace FLOP estimate failed (model/config "
                 "signature drift?) — rerun with RELPOSE_DEBUG_TRACE=1 via "
                 "utils.profiling.estimate_step_flops to see the exception")

    N, C, H = cfg.num_patches, cfg.total_num_features, cfg.num_heads
    hidden = 4 * C
    blocks = cfg.transformer_depth - 1
    seqs = 2 * B  # the megakernel runs per image
    vit_real = 2 * blocks * seqs * vit_block_macs(N, C, H, hidden, False)
    vit_pad = 2 * blocks * seqs * vit_block_macs(N, C, H, hidden, True)
    cross_real = 2 * B * essential_block_macs(N, C, H, cfg.pos_enc, False)
    cross_pad = 2 * B * essential_block_macs(N, C, H, cfg.pos_enc, True)

    print(f"peak (v5e MXU, backend-default matmul precision): "
          f"{PEAK / 1e12:.0f} TFLOP/s")
    print(f"\n== whole-step MFU ==")
    for tag, flops, ms, batch in (
            ("eval fwd  bf16", eval_flops, args.eval_ms, B),
            ("train step fp32", train_flops, args.train_fp32_ms, T),
            ("train step bf16", train_flops, args.train_bf16_ms, T)):
        mfu = flops / (ms * 1e-3) / PEAK
        print(f"  {tag:<16} batch {batch:3d}: {fmt(flops)} / {ms:.2f} ms"
              f"  -> MFU {mfu * 100:5.1f}%")

    print(f"\n== ViT megakernel, eval batch {B} "
          f"({blocks} blocks x {seqs} seqs) ==")
    print(f"  real {fmt(vit_real)}   padded-tile {fmt(vit_pad)}"
          f"   (pad tax {vit_pad / vit_real:.2f}x: d=64 and C=192 vs "
          f"128-lane tiles)")
    line("vs REAL-MAC floor", args.vit_eval_ms, vit_real)
    line("vs PADDED-TILE floor", args.vit_eval_ms, vit_pad)

    print(f"\n== essential/cross block, eval batch {B} ==")
    print(f"  real {fmt(cross_real)}   padded-tile {fmt(cross_pad)}"
          f"   (block is VPU-softmax-bound, floors for reference)")
    line("vs REAL-MAC floor", args.cross_eval_ms, cross_real)
    line("vs PADDED-TILE floor", args.cross_eval_ms, cross_pad)


if __name__ == "__main__":
    main()
