"""Fused-attention dispatch tests (CPU: einsum fallback; flash parity is
exercised on TPU in the verify drives and at import via interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.ops.attention import einsum_mha, fused_mha


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_einsum_matches_manual_softmax():
    q, k, v = _rand((2, 4, 16, 8), 0), _rand((2, 4, 16, 8), 1), _rand((2, 4, 16, 8), 2)
    out = einsum_mha(q, k, v, causal=False, sm_scale=0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.5
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_causal_masking():
    q, k, v = _rand((1, 2, 8, 4), 0), _rand((1, 2, 8, 4), 1), _rand((1, 2, 8, 4), 2)
    out = fused_mha(q, k, v, causal=True, backend="einsum")
    # row 0 attends only to key 0 -> equals v[0]
    np.testing.assert_allclose(
        np.asarray(out)[:, :, 0], np.asarray(v)[:, :, 0], atol=1e-5
    )


def test_auto_on_cpu_is_einsum():
    q, k, v = _rand((1, 2, 256, 64), 0), _rand((1, 2, 256, 64), 1), _rand((1, 2, 256, 64), 2)
    a = fused_mha(q, k, v, backend="auto")
    e = fused_mha(q, k, v, backend="einsum")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def test_pick_block():
    from agacs_tpu.ops.attention import _pick_block

    assert _pick_block(768) == (384, 768)
    assert _pick_block(750) == (384, 768)
    assert _pick_block(1536) == (512, 1536)
    assert _pick_block(1500) == (512, 1536)
    b, pad = _pick_block(130)
    assert pad >= 130 and pad % b == 0
