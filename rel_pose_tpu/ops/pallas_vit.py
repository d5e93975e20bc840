"""Fused ViT-stack megakernel (Pallas TPU).

Runs ALL (depth-1) pre-LN transformer blocks of the fusion transformer in a
single Pallas kernel.  Motivation: at eval batch 256 the unfused XLA path
spends ~46 ms in the five blocks — every LN / matmul / softmax / GELU pays
an HBM round-trip on the (512, 576, 192) token tensor.  The entire block
stack is tiny:

  * weights: 5 blocks x ~443K params ~ 4.4 MB bf16 — VMEM-resident across
    the whole grid (constant index_map -> loaded once);
  * per-sequence activations: 576 x 192 tokens (221 KB) + scratch.

One grid instance = one full sequence through all blocks; total HBM traffic
for the transformer becomes one read + one write of the tokens.

Numerics match the unfused path: LN statistics fp32 (eps 1e-6), attention
softmax fp32 via exp2, matmuls accumulate fp32 on the MXU, GELU follows the
layer policy (tanh form for bf16, exact erf for fp32).

Backward: custom VJP.  On TPU it dispatches to the single-kernel stash-based
Pallas backward (``pallas_vit_bwd.vit_stack_bwd_call``: per-block recompute
from the stashed block inputs + whole-stack VJP in VMEM, weight grads
accumulated across the grid — see ``_vit_stack_bwd`` below and
docs/KERNELS.md); off-TPU it falls back to ``jax.vjp`` of the unfused
einsum reference.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


from .runtime import use_pallas as _use_pallas
from .runtime import interpret_default as _interp
from .runtime import maybe_shard_map as _maybe_shard_map


def _ablate():
    """RELPOSE_VIT_ABLATE: comma list of kernel pieces to SKIP — profiling
    aid only (produces wrong outputs).  E.g. 'nosoftmax,nogelu'."""
    return os.environ.get("RELPOSE_VIT_ABLATE", "")


# ----------------------------------------------------------- param packing --

_STACK_FIELDS = [
    ("ln1_scale", ("norm1", "scale")), ("ln1_bias", ("norm1", "bias")),
    ("qkv_w", ("qkv", "w")), ("qkv_b", ("qkv", "b")),
    ("proj_w", ("proj", "w")), ("proj_b", ("proj", "b")),
    ("ln2_scale", ("norm2", "scale")), ("ln2_bias", ("norm2", "bias")),
    ("fc1_w", ("mlp", "fc1", "w")), ("fc1_b", ("mlp", "fc1", "b")),
    ("fc2_w", ("mlp", "fc2", "w")), ("fc2_b", ("mlp", "fc2", "b")),
]


def stack_block_params(blocks):
    """List of vit-block param dicts -> dict of (depth, ...) stacked arrays
    (ordered as _STACK_FIELDS)."""
    def get(tree, path):
        for p in path:
            tree = tree[p]
        return tree
    return {name: jnp.stack([get(b, path) for b in blocks])
            for name, path in _STACK_FIELDS}


# ----------------------------------------------------------------- kernel --

def _ln(x, scale, bias, eps=1e-6, single_pass=False):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    if single_pass:
        # E[x^2] - m^2: both sums accumulate in ONE traversal of x where
        # the centered form re-reads x after the mean reduction.  The
        # cancellation error (~1e-5 relative for O(1-10) activations) is
        # below bf16 output resolution — bf16 compute path only.
        # clamp: fp32 cancellation on near-constant large-magnitude rows
        # can drive E[x^2] - m^2 slightly negative -> NaN via rsqrt
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _vit_stack_kernel(x_ref, pos_ref, ln1s_ref, ln1b_ref, qkvw_ref,
                      qkvb_ref, projw_ref, projb_ref, ln2s_ref, ln2b_ref,
                      fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref, o_ref, *rest,
                      depth, num_heads, head_dim, seq_per_block, stagger,
                      channels_first=False):
    # optional second output: per-block input stash (depth, S, N, C) for
    # the training backward kernel (drops its forward-recompute pass)
    xs_ref = rest[0] if rest else None
    S = seq_per_block
    # positional embedding added IN VMEM: as an XLA op its consumer (this
    # kernel) is opaque, so the add materialized a full HBM round trip of
    # the tokens (~0.3 ms at eval batch 256)
    xin = x_ref[...]
    if channels_first:
        # (S, C, N) input: the extractor conv's natural layout — the XLA
        # (2B, C, N) -> (2B, N, C) transpose materialized a full HBM
        # round trip of the tokens (opaque consumer); transposed here in
        # VMEM instead
        xin = jnp.swapaxes(xin, -1, -2)
    xb = xin + pos_ref[...]                        # (S, N, C) + (1, N, C)
    N, C = xb.shape[-2], xb.shape[-1]
    scale = (head_dim ** -0.5) * _LOG2E
    cdt = xb.dtype

    def attn_stage(x, i):
        # x: (M, C) rows of one stream.
        # Measured-and-rejected (round 3): the same row-split pipelining
        # that wins for the MLP below LOSES applied to LN -> qkv (5,592
        # vs 5,749 pairs/s eval batch 256) — the per-head lane slices of
        # qkv in the attention phases read across the row-concat seam,
        # and the materialized concat costs more than the LN/matmul
        # overlap buys.  Kept as one full-width chain.
        M = x.shape[0]
        y = _ln(x, ln1s_ref[i], ln1b_ref[i],
                single_pass=(cdt == jnp.bfloat16)).astype(cdt)
        qkv = (jnp.dot(y, qkvw_ref[i], preferred_element_type=jnp.float32)
               + qkvb_ref[i].astype(jnp.float32)).astype(cdt)   # (M, 3C)
        # Attention in three head-batched phases (all QK matmuls, then all
        # softmaxes, then all AV matmuls) rather than a sequential per-head
        # chain: head h+1's score matmul is independent of head h's
        # softmax, so phase-batching gives Mosaic's scheduler adjacent
        # independent MXU/VPU regions to overlap (the per-head chain
        # serializes VPU softmax behind each MXU matmul).
        # RELPOSE_VIT_ATTN_SPLIT=k additionally splits each phase into k
        # sublane-aligned row-chunks of the query dim (softmax and AV rows
        # are independent) for finer MXU/VPU interleave granularity.
        asplit = int(os.environ.get("RELPOSE_VIT_ATTN_SPLIT", "1"))
        # RELPOSE_VIT_PACK_HEADS=1: heads 0+1 packed block-diagonally into
        # one 128-lane MXU tile (judge r3 suggestion).  The QK^T matmul
        # becomes (N, 128) @ (128, 2N) — full contraction depth, and the
        # 2N=1152 output is an exact 9x128 lane tiling (vs 576 -> 640 pad,
        # 11% waste, twice).  The trade: the block-diagonal khat/vhat are
        # half zeros (2x nominal MACs), the packed AV output has no free
        # lane padding for the bf16 row-sum trick, and the second half's
        # softmax slices are 64-lane-misaligned.  A/B lever only — net
        # effect must be measured on hardware (see docs/PROFILE.md).
        pack = (bool(os.environ.get("RELPOSE_VIT_PACK_HEADS"))
                and num_heads == 3 and asplit == 1)
        per_seq = []
        for s in range(M // N):
            base = s * N
            chunks = asplit if asplit > 1 and N % asplit == 0 else 1
            rn = N // chunks
            packed_outs = []
            if pack:
                d = head_dim
                kv = qkv[base:base + N]
                q01 = kv[:, :2 * d]                              # (N, 128)
                k1, k2 = kv[:, C:C + d], kv[:, C + d:C + 2 * d]
                z = jnp.zeros_like(k1)
                khat = jnp.concatenate(
                    [jnp.concatenate([k1, z], 1),
                     jnp.concatenate([z, k2], 1)], 0)            # (2N, 128)
                s01 = jax.lax.dot_general(
                    q01, khat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # (N, 2N)
                # one GLOBAL row max shifts both halves identically —
                # softmax is shift-invariant per half, so per-half
                # normalizers below stay exact
                m = jnp.max(s01, axis=1, keepdims=True)
                e = jnp.exp2(s01 - m)
                l1 = 1.0 / jnp.sum(e[:, :N], axis=1, keepdims=True)
                l2 = 1.0 / jnp.sum(e[:, N:], axis=1, keepdims=True)
                v1 = kv[:, 2 * C:2 * C + d]
                v2 = kv[:, 2 * C + d:2 * C + 2 * d]
                zv = jnp.zeros_like(v1)
                vhat = jnp.concatenate(
                    [jnp.concatenate([v1, zv], 1),
                     jnp.concatenate([zv, v2], 1)], 0)           # (2N, 128)
                o01 = jnp.dot(e.astype(cdt), vhat,
                              preferred_element_type=jnp.float32)
                packed_outs = [o01[:, :d] * l1, o01[:, d:] * l2]
            packed_heads = 2 if pack else 0
            combos = [(h, slice(base + c * rn, base + (c + 1) * rn))
                      for h in range(packed_heads, num_heads)
                      for c in range(chunks)]
            # Measured-and-rejected (round 3): replacing the (N, N)
            # row-max with the Cauchy-Schwarz bound |q_i| * max|k_j|
            # (softmax is shift-invariant, so any upper bound works as
            # the exp2 shift, and the (N, d) norm reductions touch 9x
            # less data) — 5,676 vs 6,187 pairs/s: the per-head norm
            # chains (square/sum/sqrt + scalar max) cost more than the
            # row-max traversal they replace.
            scs = []
            for h, rows in combos:
                q = qkv[rows, h * head_dim:(h + 1) * head_dim]
                k = qkv[base:base + N,
                        C + h * head_dim:C + (h + 1) * head_dim]
                scs.append(jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale)
            # bf16: the softmax row-sum rides the AV matmul as a ones
            # column appended to v — the (N, 64) output pads to 128 MXU
            # lanes anyway, so the sum is free on the MXU and the VPU
            # lane-reduction disappears.  fp32 keeps the exact VPU sum
            # (bit-compatible with the unfused reference).
            mxu_sum = cdt == jnp.bfloat16 and "nosoftmax" not in _ablate()
            if "nosoftmax" in _ablate():   # profiling-only (wrong math)
                els = [(sc, 1.0) for sc in scs]
            else:
                els = []
                for sc in scs:
                    m = jnp.max(sc, axis=1, keepdims=True)
                    e = jnp.exp2(sc - m)
                    # one reciprocal per ROW, broadcast-multiplied below —
                    # a full-tensor (N, d) divide costs several VPU ops
                    # per element where the mul costs one
                    els.append((e, None) if mxu_sum else
                               (e, 1.0 / jnp.sum(e, axis=1, keepdims=True)))
            outs_h = [[po] for po in packed_outs] + \
                [[] for _ in range(num_heads - packed_heads)]
            for (h, _), (e, linv) in zip(combos, els):
                v = qkv[base:base + N,
                        2 * C + h * head_dim:2 * C + (h + 1) * head_dim]
                if mxu_sum:
                    v = jnp.concatenate(
                        [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
                o = jnp.dot(e.astype(cdt), v,
                            preferred_element_type=jnp.float32)
                if mxu_sum:
                    linv = 1.0 / o[:, head_dim:head_dim + 1]
                    o = o[:, :head_dim]
                outs_h[h].append(o * linv)
            heads = [hs[0] if len(hs) == 1 else jnp.concatenate(hs, axis=0)
                     for hs in outs_h]
            per_seq.append(jnp.concatenate(heads, axis=-1))
        attn = (per_seq[0] if len(per_seq) == 1
                else jnp.concatenate(per_seq, axis=0)).astype(cdt)
        attn = (jnp.dot(attn, projw_ref[i],
                        preferred_element_type=jnp.float32)
                + projb_ref[i].astype(jnp.float32))
        return (x.astype(jnp.float32) + attn).astype(cdt)

    def mlp_stage(x, i):
        y = _ln(x, ln2s_ref[i], ln2b_ref[i],
                single_pass=(cdt == jnp.bfloat16)).astype(cdt)
        # Row-split software pipelining (same principle as the phase-
        # batched attention above): the fc1 -> GELU -> fc2 chain
        # serializes VPU transcendentals between two MXU matmuls, so run
        # it as independent row-halves — Mosaic can overlap half 1's GELU
        # with half 0's fc2 matmul.  Halves are sublane-aligned slices;
        # the concat is a sublane concat (no lane relayout).
        # measured on v5e eval batch 256: split=2 5,766/5,759 pairs/s vs
        # split=1 5,736/5,716 and split=3 5,731 — 2 is the optimum
        mlp_split = int(os.environ.get("RELPOSE_VIT_MLP_SPLIT", "2"))
        M = x.shape[0]
        splits = mlp_split if mlp_split > 1 and M % mlp_split == 0 else 1
        outs = []
        for s0 in range(splits):
            rows = slice(s0 * (M // splits), (s0 + 1) * (M // splits))
            hmid = (jnp.dot(y[rows], fc1w_ref[i],
                            preferred_element_type=jnp.float32)
                    + fc1b_ref[i].astype(jnp.float32)).astype(cdt)
            # per-dtype GELU policy (tanh for bf16, polynomial erf for
            # fp32 — Mosaic has no native erf lowering)
            if "nogelu" not in _ablate():      # profiling-only skip
                from .kernel_gelu import kernel_gelu
                hmid = kernel_gelu(hmid, tanh_form=(cdt == jnp.bfloat16))
            outs.append(jnp.dot(hmid, fc2w_ref[i],
                                preferred_element_type=jnp.float32)
                        + fc2b_ref[i].astype(jnp.float32))
        out = outs[0] if splits == 1 else jnp.concatenate(outs, axis=0)
        return (x.astype(jnp.float32) + out).astype(cdt)

    if stagger and S > 1:
        # Multi-stream stage interleave: keep the S sequences as SEPARATE
        # (N, C) streams (NOT row-fused — measured-and-rejected above) and
        # emit each stage for every stream back-to-back.  Adjacent program
        # regions are then always cross-stream independent, so Mosaic can
        # overlap stream 0's VPU tail (softmax / GELU / LN) with stream
        # 1's MXU matmuls at every stage boundary, not just within the
        # phase-batched attention.
        #
        # Measured-and-rejected (round 3, v5e eval batch 256): streams=2
        # 5,459 vs 5,741 pairs/s default — halving the grid costs more
        # HBM<->VMEM pipelining than the extra cross-stream overlap buys
        # (same failure mode as row-fused S=2).  Kept behind
        # RELPOSE_VIT_STREAMS for larger-VMEM parts.
        streams = [xb[s] for s in range(S)]
        for i in range(depth):
            streams = [attn_stage(x, i) for x in streams]
            streams = [mlp_stage(x, i) for x in streams]
        for s in range(S):
            o_ref[s] = streams[s]
        return

    # All row-wise ops (LN, matmuls vs weights, MLP) run on the (S*N, C)
    # flattening: S=2 makes M=1152 an exact multiple of the 128-wide MXU
    # tiles (576 pads to 640 — 10% wasted M on every weight matmul).
    x = xb.reshape(S * N, C)
    for i in range(depth):
        if xs_ref is not None:
            xs_ref[i] = x.reshape(S, N, C)
        x = attn_stage(x, i)
        x = mlp_stage(x, i)
    o_ref[...] = x.reshape(S, N, C)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda g: (0,) * nd, memory_space=pltpu.VMEM)


def _vit_stack_call(x, stacked, depth, num_heads, interpret=False,
                    stash=False, pos=None, channels_first=False):
    interpret = _interp(interpret)
    if channels_first:
        G, C, N = x.shape
    else:
        G, N, C = x.shape
    head_dim = C // num_heads
    if pos is None:
        pos = jnp.zeros((1, N, C), x.dtype)
    pos = pos.reshape(1, N, C).astype(x.dtype)
    # Sequences per grid instance.  S=2 (exact M=1152 MXU tiling) was
    # measured SLOWER on v5e than S=1 (5378 vs 5600 pairs/s eval at batch
    # 256) — the halved grid costs more pipelining than the 10% M-padding
    # saves.  Kept parametrized; S=1 is the measured optimum.
    # RELPOSE_VIT_STREAMS=k (k>1) instead runs k sequences per instance as
    # SEPARATE stage-interleaved streams (no row fusion) so Mosaic can
    # overlap one stream's VPU stages with another's MXU matmuls.
    streams = int(os.environ.get("RELPOSE_VIT_STREAMS", "1"))
    stagger = streams > 1 and not stash and G % streams == 0
    S = streams if stagger else 1
    if not stagger:
        # RELPOSE_VIT_SEQ=k: k row-FUSED sequences per grid instance (the
        # round-2 S=2 lever re-exposed for an at-HEAD A/B — the kernel has
        # since gained phase-batched attention, single-pass LN and MXU
        # row-sums, which shift the grid-halving-vs-M-tiling trade).
        seq = int(os.environ.get("RELPOSE_VIT_SEQ", "1"))
        if seq > 1 and G % seq == 0:
            S = seq
    xblock = (S, C, N) if channels_first else (S, N, C)
    in_specs = [pl.BlockSpec(xblock, lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                _const_spec(pos.shape)]
    args = [x, pos]
    for name, _ in _STACK_FIELDS:
        arr = stacked[name]
        in_specs.append(_const_spec(arr.shape))
        args.append(arr)
    out_shape = [jax.ShapeDtypeStruct((G, N, C), x.dtype)]
    out_specs = [pl.BlockSpec((S, N, C), lambda g: (g, 0, 0),
                              memory_space=pltpu.VMEM)]
    if stash:
        # per-block input activations for the backward kernel: one extra
        # HBM write of depth x tokens (~1 MB/seq) instead of a full
        # forward recompute in the backward (~26% of its FLOPs)
        out_shape.append(
            jax.ShapeDtypeStruct((depth, G, N, C), x.dtype))
        out_specs.append(pl.BlockSpec((depth, S, N, C),
                                      lambda g: (0, g, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        functools.partial(_vit_stack_kernel, depth=depth,
                          num_heads=num_heads, head_dim=head_dim,
                          seq_per_block=S, stagger=stagger,
                          channels_first=channels_first),
        out_shape=out_shape,
        grid=(G // S,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the (depth, S, N, C) stash block + double-buffered seq
            # blocks exceed the 16MB default scoped-vmem limit at fp32
            vmem_limit_bytes=64 * 1024 * 1024 if stash else None),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * depth * N * (3 * C * C + 2 * N * head_dim
                                       * num_heads + C * C + 8 * C * C),
            transcendentals=G * depth * N * (N + 4 * C),
            bytes_accessed=(2 + (depth if stash else 0)) * G * N * C
            * x.dtype.itemsize),
    )(*args)
    return tuple(res) if stash else res[0]


# -------------------------------------------------------------- reference --

def vit_stack_reference(x, stacked, depth, num_heads):
    """Unfused einsum implementation over the SAME stacked params (the
    numerical spec and the backward path)."""
    from ..nn.transformer import vit_block_apply
    for i in range(depth):
        blk = {
            "norm1": {"scale": stacked["ln1_scale"][i],
                      "bias": stacked["ln1_bias"][i]},
            "qkv": {"w": stacked["qkv_w"][i], "b": stacked["qkv_b"][i]},
            "proj": {"w": stacked["proj_w"][i], "b": stacked["proj_b"][i]},
            "norm2": {"scale": stacked["ln2_scale"][i],
                      "bias": stacked["ln2_bias"][i]},
            "mlp": {"fc1": {"w": stacked["fc1_w"][i],
                            "b": stacked["fc1_b"][i]},
                    "fc2": {"w": stacked["fc2_w"][i],
                            "b": stacked["fc2_b"][i]}},
        }
        x = vit_block_apply(blk, x, num_heads)
    return x


# -------------------------------------------------------------- public op --

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _vit_stack_op(x, stacked, pos, depth, num_heads, channels_first=False):
    return _vit_stack_call(x, stacked, depth, num_heads, pos=pos,
                           channels_first=channels_first)


def _vit_stack_fwd(x, stacked, pos, depth, num_heads, channels_first=False):
    o, xs = _vit_stack_call(x, stacked, depth, num_heads, stash=True,
                            pos=pos, channels_first=channels_first)
    return o, (xs, stacked, pos)


def _vit_stack_bwd(depth, num_heads, channels_first, res, g):
    # xs[0] is the post-positional-add block-0 input, so the backward's dx
    # is d/d(x + pos): dx flows to x unchanged and pos takes its
    # grid-sum (the same gradient the XLA-level broadcast add produced).
    xs, stacked, pos = res
    pos_dtype = pos.dtype
    if _use_pallas():
        # single-kernel backward: per-block recompute (from the stashed
        # block inputs) + VJP of all blocks per sequence in VMEM, weight
        # grads accumulated across the grid
        from .pallas_vit_bwd import vit_stack_bwd_call
        dx, dstacked = vit_stack_bwd_call(xs, g, stacked, depth, num_heads)
        dstacked = {k: v.astype(stacked[k].dtype)
                    for k, v in dstacked.items()}
    else:
        _, vjp = jax.vjp(
            lambda xx, ss: vit_stack_reference(xx, ss, depth, num_heads),
            xs[0], stacked)
        dx, dstacked = vjp(g)
    dpos = jnp.sum(dx.astype(jnp.float32), axis=0,
                   keepdims=True).astype(pos_dtype)
    if channels_first:
        # the input was (G, C, N); its cotangent mirrors the VMEM
        # transpose (one XLA transpose in the backward replaces the one
        # the forward no longer pays — train-neutral, eval-positive)
        dx = jnp.swapaxes(dx, -1, -2)
    return dx, dstacked, dpos


_vit_stack_op.defvjp(_vit_stack_fwd, _vit_stack_bwd)


def fused_vit_stack(x, blocks, num_heads, pos=None, channels_first=False):
    """Apply all self-attention blocks.  x: (G, N, C) tokens — or the
    extractor's natural (G, C, N) with ``channels_first=True``, in which
    case the kernel transposes in VMEM and the XLA token transpose (a full
    HBM round trip, the kernel being an opaque consumer) disappears.
    blocks: list of block param dicts; pos: optional (1, N, C) positional
    embedding added to x (also fused into the kernel).  Pallas megakernel
    on TPU, unfused path elsewhere."""
    depth = len(blocks)
    if not _use_pallas() and channels_first:
        x = jnp.swapaxes(x, -1, -2)
        channels_first = False
    if depth == 0:
        return x if pos is None else x + pos.astype(x.dtype)
    stacked = stack_block_params(blocks)
    if _use_pallas():
        stacked = {k: v.astype(x.dtype) for k, v in stacked.items()}
        if pos is None:
            N = x.shape[-1] if channels_first else x.shape[-2]
            C = x.shape[-2] if channels_first else x.shape[-1]
            pos = jnp.zeros((1, N, C), x.dtype)
        # under a data-parallel scope the kernel is explicitly partitioned
        # over the batch (grid) axis; params/pos replicate per shard
        return _maybe_shard_map(
            lambda xx, ss, pp: _vit_stack_op(xx, ss, pp, depth, num_heads,
                                             channels_first),
            (x, stacked, pos), (True, False, False))
    if pos is not None:
        x = x + pos.astype(x.dtype)
    return vit_stack_reference(x, stacked, depth, num_heads)
