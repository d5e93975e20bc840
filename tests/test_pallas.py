"""Pallas kernel equivalence tests (interpret mode on CPU).

Each fused kernel is validated against its einsum reference — forward AND
backward (custom VJP vs autodiff of the reference).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rel_pose_tpu.ops.pallas_attention import (
    mhsa_reference, _fwd_call as mhsa_fwd_call, _bwd_call as mhsa_bwd_call,
)
from rel_pose_tpu.ops.pallas_essential import (
    bilinear_attention_reference,
    _fwd_call as bil_fwd_call, _bwd_call as bil_bwd_call,
)

RNG = np.random.default_rng(9)
# modest shapes for interpreter speed; same structure as production
G, N, D, E = 4, 64, 32, 38
SCALE = D ** -0.5


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32) * 0.5)


class TestFusedMHSA:
    def test_forward_matches_reference(self):
        q, k, v = _rand(G, N, D), _rand(G, N, D), _rand(G, N, D)
        ref = mhsa_reference(q, k, v, SCALE)
        out = mhsa_fwd_call(q, k, v, SCALE, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_backward_matches_reference(self):
        q, k, v = _rand(G, N, D), _rand(G, N, D), _rand(G, N, D)
        do = _rand(G, N, D)

        def ref_loss(q, k, v):
            return jnp.sum(mhsa_reference(q, k, v, SCALE) * do)

        dq_r, dk_r, dv_r = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        dq, dk, dv = mhsa_bwd_call(q, k, v, do, SCALE, interpret=True)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), atol=1e-4)


class TestFusedBilinear:
    def test_forward_dual_softmax(self):
        q, k = _rand(G, N, D), _rand(G, N, D)
        va, vb = _rand(G, N, E), _rand(G, N, E)
        ref = bilinear_attention_reference(q, k, va, vb, SCALE)
        out = bil_fwd_call(q, k, va, vb, SCALE, False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_forward_single_softmax(self):
        q, k = _rand(G, N, D), _rand(G, N, D)
        va, vb = _rand(G, N, E), _rand(G, N, E)
        ref = bilinear_attention_reference(q, k, va, vb, SCALE,
                                           single_softmax=True)
        out = bil_fwd_call(q, k, va, vb, SCALE, True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_backward_dual_softmax(self):
        q, k = _rand(G, N, D), _rand(G, N, D)
        va, vb = _rand(G, N, E), _rand(G, N, E)
        df = _rand(G, E, E)

        def ref_loss(q, k, va, vb):
            return jnp.sum(
                bilinear_attention_reference(q, k, va, vb, SCALE) * df)

        grads_r = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, va, vb)
        grads = bil_bwd_call(q, k, va, vb, df, SCALE, False, interpret=True)
        for g, gr, name in zip(grads, grads_r, ["dq", "dk", "dva", "dvb"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                       atol=2e-4, err_msg=name)

    def test_backward_single_softmax(self):
        q, k = _rand(G, N, D), _rand(G, N, D)
        va, vb = _rand(G, N, E), _rand(G, N, E)
        df = _rand(G, E, E)

        def ref_loss(q, k, va, vb):
            return jnp.sum(bilinear_attention_reference(
                q, k, va, vb, SCALE, single_softmax=True) * df)

        grads_r = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, va, vb)
        grads = bil_bwd_call(q, k, va, vb, df, SCALE, True, interpret=True)
        for g, gr, name in zip(grads, grads_r, ["dq", "dk", "dva", "dvb"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                       atol=2e-4, err_msg=name)

    def test_backward_cross_va_vb(self):
        """va != vb (the --cross_features wiring) exercises the asymmetric
        dva/dvb paths."""
        q, k = _rand(G, N, D), _rand(G, N, D)
        va, vb = _rand(G, N, E), _rand(G, N, E)
        df = _rand(G, E, E)
        # forward value check at production-like head dim
        ref = bilinear_attention_reference(q, k, va, vb, SCALE)
        out = bil_fwd_call(q, k, va, vb, SCALE, False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


class TestProductionShapes:
    def test_full_shape_interpret(self):
        """One instance at the real model shape (N=576, d=64, e=70)."""
        q, k = _rand(1, 576, 64), _rand(1, 576, 64)
        va = _rand(1, 576, 70)
        ref = bilinear_attention_reference(q, k, va, va, 64 ** -0.5)
        out = bil_fwd_call(q, k, va, va, 64 ** -0.5, False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
