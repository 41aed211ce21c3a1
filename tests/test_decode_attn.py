"""Pallas decode-attention kernel vs pure-jnp oracle (interpret mode).

The compiled kernel's on-TPU token parity is exercised by the driver
bench and the verify drive; here the kernel logic itself (block-diagonal
query expansion, ancestry one-hot reads, PE gate mix, masking) runs
through the Pallas interpreter on CPU against an einsum oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.ops.decode_attn import (
    TIME_ALIGN,
    decode_cache_attention,
    decode_cache_attention_ref,
    kernel_fits,
    kernel_viable,
    pad_time,
    pick_chunk,
)

N, TP, D, H = 8, 32, 64, 4


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3)

    return {
        "q": mk(N, D), "k": mk(N, TP, D), "v": mk(N, TP, D),
        "q_cs": mk(N, D), "k_cs": mk(N, TP, D),
        "gate": jnp.asarray(rng.rand(H).astype(np.float32)),
        "anc": jnp.asarray(rng.randint(0, 4, (N, TP)), jnp.int32),
    }


@pytest.mark.parametrize("pos", [0, 5, TP - 1])
def test_plain(data, pos):
    o_k = decode_cache_attention(
        data["q"], data["k"], data["v"], pos, H, interpret=True
    )
    o_r = decode_cache_attention_ref(data["q"], data["k"], data["v"], pos, H)
    np.testing.assert_allclose(o_k, o_r, atol=1e-6)


def test_plain_pe(data):
    kw = dict(q_cs=data["q_cs"], k_cs=data["k_cs"], gate=data["gate"])
    o_k = decode_cache_attention(
        data["q"], data["k"], data["v"], 7, H, interpret=True, **kw
    )
    o_r = decode_cache_attention_ref(data["q"], data["k"], data["v"], 7, H, **kw)
    np.testing.assert_allclose(o_k, o_r, atol=1e-6)


@pytest.mark.parametrize("pe", [False, True])
def test_grouped_ancestry(data, pe):
    kw = dict(anc_local=data["anc"], beam=4)
    if pe:
        kw.update(q_cs=data["q_cs"], k_cs=data["k_cs"], gate=data["gate"])
    o_k = decode_cache_attention(
        data["q"], data["k"], data["v"], 9, H, interpret=True, **kw
    )
    o_r = decode_cache_attention_ref(data["q"], data["k"], data["v"], 9, H, **kw)
    np.testing.assert_allclose(o_k, o_r, atol=1e-6)


def test_grouped_matches_physical_gather(data):
    """Ancestry reads must equal attention over physically gathered rows."""
    beam = 4
    rng = np.random.RandomState(1)
    # a realistic ancestry map: position t of row i lives in row anc[i, t]
    anc = np.zeros((N, TP), np.int32)
    for g in range(N // beam):
        for t in range(TP):
            anc[g * beam:(g + 1) * beam, t] = rng.randint(0, beam, beam)
    anc_j = jnp.asarray(anc)
    o_k = decode_cache_attention(
        data["q"], data["k"], data["v"], TP - 1, H,
        anc_local=anc_j, beam=beam, interpret=True,
    )
    # physical gather: k_phys[i, t] = k[group(i)*beam + anc[i, t], t]
    k_np, v_np = np.asarray(data["k"]), np.asarray(data["v"])
    kg = np.zeros_like(k_np)
    vg = np.zeros_like(v_np)
    for i in range(N):
        g0 = (i // beam) * beam
        for t in range(TP):
            kg[i, t] = k_np[g0 + anc[i, t], t]
            vg[i, t] = v_np[g0 + anc[i, t], t]
    o_r = decode_cache_attention_ref(
        data["q"], jnp.asarray(kg), jnp.asarray(vg), TP - 1, H
    )
    np.testing.assert_allclose(o_k, o_r, atol=1e-6)


def test_mask_ignores_padded_rows(data):
    """Rows beyond pos (incl. TIME_ALIGN padding) must not contribute."""
    k_bad = data["k"].at[:, 10:, :].set(1e9)
    v_bad = data["v"].at[:, 10:, :].set(1e9)
    o_k = decode_cache_attention(data["q"], k_bad, v_bad, 9, H, interpret=True)
    o_r = decode_cache_attention_ref(data["q"], data["k"], data["v"], 9, H)
    np.testing.assert_allclose(o_k, o_r, atol=1e-6)


def test_lane_unaligned_dims():
    """Side-ladder dims: d=192 (not a 128 multiple), H=4 — the cache
    block's trailing dim spans the array so Mosaic accepts it."""
    rng = np.random.RandomState(2)
    n, tp, d, h = 6, 16, 192, 4
    q = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(n, tp, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(n, tp, d).astype(np.float32) * 0.3)
    o_k = decode_cache_attention(q, k, v, 11, h, interpret=True)
    o_r = decode_cache_attention_ref(q, k, v, 11, h)
    np.testing.assert_allclose(o_k, o_r, atol=1e-6)


def test_helpers():
    assert pad_time(105) == 112
    assert pad_time(TIME_ALIGN) == TIME_ALIGN
    assert kernel_fits(2, 5, 112, 768)
    assert not kernel_fits(3, 16, 448, 1280)


def test_chunk_helpers():
    # the 3-cache PE variant at full 448 ctx: single-block overflows,
    # chunking (tc=224: 2 chunks) fits
    assert not kernel_fits(3, 5, 448, 768)
    assert pick_chunk(3, 5, 448, 768) == 224
    assert kernel_viable(3, 5, 448, 768)
    # already fits -> still viable; tiny contexts with no valid divisor
    assert kernel_viable(2, 5, 112, 768)
    assert pick_chunk(3, 4096, 16, 768) is None


@pytest.mark.parametrize("pe", [False, True])
@pytest.mark.parametrize("pos", [3, 40, 63])
def test_chunked_grouped(pe, pos, monkeypatch):
    """Force the time-chunked dispatch via a tiny VMEM budget."""
    from agacs_tpu.ops import decode_attn as da

    rng = np.random.RandomState(3)
    n, tp, d, h, beam = 8, 64, 64, 4, 4
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    q, k, v = mk(n, d), mk(n, tp, d), mk(n, tp, d)
    anc = jnp.asarray(rng.randint(0, beam, (n, tp)), jnp.int32)
    kw = dict(anc_local=anc, beam=beam)
    if pe:
        kw.update(
            q_cs=mk(n, d), k_cs=mk(n, tp, d),
            gate=jnp.asarray(rng.rand(h).astype(np.float32)),
        )
    n_caches = 3 if pe else 2
    # budget fits one tc=32 chunk but not the tp=64 single block
    budget = 2 * n_caches * beam * 32 * d * 2
    monkeypatch.setattr(da, "_VMEM_BUDGET", budget)
    assert da.pick_chunk(n_caches, beam, tp, d) == 32
    o_k = decode_cache_attention(q, k, v, pos, h, interpret=True, **kw)
    o_r = decode_cache_attention_ref(q, k, v, pos, h, **kw)
    np.testing.assert_allclose(o_k, o_r, atol=2e-6)


def test_chunked_plain(monkeypatch):
    """Pseudo-grouped plain rows also dispatch through the chunked path
    when even the smallest row block cannot hold the full context."""
    from agacs_tpu.ops import decode_attn as da

    rng = np.random.RandomState(4)
    n, tp, d, h = 4, 64, 64, 4
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    q, k, v = mk(n, d), mk(n, tp, d), mk(n, tp, d)
    budget = 2 * 2 * 1 * 16 * d * 2  # even rows=1 fits only at tc=16
    monkeypatch.setattr(da, "_VMEM_BUDGET", budget)
    o_k = decode_cache_attention(q, k, v, 50, h, interpret=True)
    o_r = decode_cache_attention_ref(q, k, v, 50, h)
    np.testing.assert_allclose(o_k, o_r, atol=2e-6)


# ---------------------------------------------------------------------------
# int8 quantized caches + shared-cache grouped kernel
# ---------------------------------------------------------------------------


def _quantize(x):
    s = np.abs(np.asarray(x, np.float32)).reshape(-1, x.shape[-1]).max(0) / 127.0
    s = np.maximum(s, 1e-8)
    q = np.clip(np.round(np.asarray(x) / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s, jnp.float32)


@pytest.mark.parametrize("pos", [0, 5, TP - 1])
def test_plain_int8(data, pos):
    k8, ks = _quantize(data["k"])
    v8, vs = _quantize(data["v"])
    o_k = decode_cache_attention(
        data["q"], k8, v8, pos, H, k_scale=ks, v_scale=vs, interpret=True
    )
    o_r = decode_cache_attention_ref(
        data["q"], k8, v8, pos, H, k_scale=ks, v_scale=vs
    )
    # kernel folds scales differently (into q / post-reduction) and
    # dots in bf16; both describe the same dequantized math
    np.testing.assert_allclose(o_k, o_r, atol=2e-3)
    # and both sit near the unquantized attention
    o_f = decode_cache_attention_ref(data["q"], data["k"], data["v"], pos, H)
    err = np.abs(np.asarray(o_k) - np.asarray(o_f)).max()
    assert err < 0.05 * np.abs(np.asarray(o_f)).max(), err


def test_int8_grouped_ancestry(data):
    k8, ks = _quantize(data["k"])
    v8, vs = _quantize(data["v"])
    kw = dict(anc_local=data["anc"] % 4, beam=4)
    o_k = decode_cache_attention(
        data["q"], k8, v8, 9, H, k_scale=ks, v_scale=vs, interpret=True, **kw
    )
    o_r = decode_cache_attention_ref(
        data["q"], k8, v8, 9, H, k_scale=ks, v_scale=vs, **kw
    )
    np.testing.assert_allclose(o_k, o_r, atol=2e-3)


from agacs_tpu.ops.decode_attn import (  # noqa: E402
    decode_shared_cache_attention,
    decode_shared_cache_attention_ref,
    shared_kernel_fits,
)

G, BEAM = 2, 4


@pytest.fixture(scope="module")
def shared_data():
    rng = np.random.RandomState(1)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3)

    return {
        "q": mk(G * BEAM, D), "k": mk(G, TP, D), "v": mk(G, TP, D),
    }


@pytest.mark.parametrize("pos", [0, 7, TP - 1])
def test_shared(shared_data, pos):
    d = shared_data
    o_k = decode_shared_cache_attention(
        d["q"], d["k"], d["v"], pos, H, BEAM, interpret=True
    )
    o_r = decode_shared_cache_attention_ref(d["q"], d["k"], d["v"], pos, H, BEAM)
    np.testing.assert_allclose(o_k, o_r, atol=1e-6)
    assert o_k.shape == (G * BEAM, D)


def test_shared_int8(shared_data):
    d = shared_data
    k8, ks = _quantize(d["k"])
    v8, vs = _quantize(d["v"])
    o_k = decode_shared_cache_attention(
        d["q"], k8, v8, 11, H, BEAM, k_scale=ks, v_scale=vs, interpret=True
    )
    o_r = decode_shared_cache_attention_ref(
        d["q"], k8, v8, 11, H, BEAM, k_scale=ks, v_scale=vs
    )
    np.testing.assert_allclose(o_k, o_r, atol=2e-3)
    o_f = decode_shared_cache_attention_ref(d["q"], d["k"], d["v"], 11, H, BEAM)
    err = np.abs(np.asarray(o_k) - np.asarray(o_f)).max()
    assert err < 0.05 * np.abs(np.asarray(o_f)).max(), err


def test_shared_matches_per_row_replication(shared_data):
    # the shared kernel must equal the per-row kernel run on caches
    # replicated beam times (the layout it replaces)
    d = shared_data
    k_rep = jnp.repeat(d["k"], BEAM, axis=0)  # (G*BEAM, TP, D)
    v_rep = jnp.repeat(d["v"], BEAM, axis=0)
    o_shared = decode_shared_cache_attention(
        d["q"], d["k"], d["v"], 13, H, BEAM, interpret=True
    )
    o_rep = decode_cache_attention_ref(d["q"], k_rep, v_rep, 13, H)
    np.testing.assert_allclose(o_shared, o_rep, atol=1e-6)


def test_shared_fits_helper():
    assert shared_kernel_fits(1504, 768)          # whisper-small, bf16
    assert shared_kernel_fits(1504, 1280, 1)      # whisper-large, int8
    assert not shared_kernel_fits(1504, 1280, 2)  # whisper-large, bf16
