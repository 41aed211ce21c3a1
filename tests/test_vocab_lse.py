"""Parity tests for the streaming vocab-lse kernel (ops/vocab_lse.py)
and its consumers: the streaming CTC head (train/losses.py
ctc_loss_streaming) and the streaming transducer joint
(models/transducer_asr._blank_emit_streaming). Kernels run interpreted on
the CPU mesh; the same checks were run on the real chip (docs/PERF.md
round-5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.ops import vocab_lse as vl
from agacs_tpu.train.losses import (
    IGNORE_ID,
    ctc_loss,
    ctc_loss_from_planes,
    ctc_loss_streaming,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("AGACS_VOCAB_LSE", "interpret")


def test_streaming_lse_parity():
    n, k, v = 700, 256, 3000  # deliberately non-tile-aligned
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, k).astype(np.float32) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, v).astype(np.float32) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(n).astype(np.float32))

    ref = vl._einsum_ref(x, w, b)
    got = vl._fwd_pallas(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    _, vjp = jax.vjp(lambda *a: vl._einsum_ref(*a), x, w, b)
    refs = vjp(g)
    outs = jax.grad(
        lambda x_, w_, b_: jnp.sum(vl.streaming_lse(x_, w_, b_, True) * g),
        argnums=(0, 1, 2),
    )(x, w, b)
    for name, a, r in zip("dx dw db".split(), outs, refs):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        np.testing.assert_allclose(
            a, r, atol=max(2e-2 * np.abs(r).max(), 1e-4), err_msg=name
        )


def _ctc_case():
    b, t, v, u, d = 4, 37, 500, 9, 128
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.3,
                      jnp.bfloat16)
    w = jnp.asarray(rng.randn(d, v).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    labels = rng.randint(1, v, (b, u))
    labels[1, 2] = labels[1, 1]  # repeated label (skip-transition case)
    label_lens = np.asarray([u, u - 3, 1, 0])
    labels = np.where(np.arange(u)[None] < label_lens[:, None], labels,
                      IGNORE_ID)
    logit_lens = jnp.asarray([t, t - 5, 12, 8], jnp.int32)
    return (enc, w, bias, logit_lens, jnp.asarray(labels, jnp.int32),
            jnp.asarray(label_lens, jnp.int32))


def test_ctc_streaming_matches_dense():
    """Values + all three head grads vs the dense optax path, covering
    ragged lens, a zero-length-label row, and a repeated label."""
    enc, w, bias, logit_lens, labels, label_lens = _ctc_case()
    labels0 = jnp.where(labels == IGNORE_ID, 0, labels)

    def dense(e, w_, b_):
        logits = jnp.einsum(
            "btd,dv->btv", e, w_.astype(e.dtype)
        ).astype(jnp.float32) + b_
        return ctc_loss(logits, logit_lens, labels0, label_lens)

    def stream(e, w_, b_):
        return ctc_loss_streaming(e, w_, b_, logit_lens, labels, label_lens)

    ld, ls = dense(enc, w, bias), stream(enc, w, bias)
    assert abs(float(ld) - float(ls)) < 2e-3 * max(abs(float(ld)), 1.0)
    gd = jax.grad(dense, argnums=(0, 1, 2))(enc, w, bias)
    gs = jax.grad(stream, argnums=(0, 1, 2))(enc, w, bias)
    for name, a, r in zip("denc dw dbias".split(), gs, gd):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        np.testing.assert_allclose(
            a, r, atol=max(1e-2 * np.abs(r).max(), 1e-3), err_msg=name
        )


def test_ctc_planes_infeasible_zeroed():
    """zero_infinity parity: label longer than frames contributes 0."""
    enc, w, bias, logit_lens, labels, label_lens = _ctc_case()
    short = logit_lens.at[0].set(2)  # row 0: 9 labels, 2 frames
    l_all = ctc_loss_streaming(enc, w, bias, short, labels, label_lens)
    # dense path with identical masking
    labels0 = jnp.where(labels == IGNORE_ID, 0, labels)
    logits = jnp.einsum(
        "btd,dv->btv", enc, w.astype(enc.dtype)
    ).astype(jnp.float32) + bias
    l_ref = ctc_loss(logits, short, labels0, label_lens)
    assert abs(float(l_all) - float(l_ref)) < 2e-3 * abs(float(l_ref))


def test_transducer_streaming_joint_matches_lattice():
    from agacs_tpu.models.transducer import (
        TransducerConfig,
        init_transducer_params,
        joint_lattice,
    )
    from agacs_tpu.models.transducer_asr import _blank_emit_streaming
    from agacs_tpu.train.rnnt_loss import (
        rnnt_loss,
        rnnt_loss_from_blank_emit,
    )

    v, b, t, u, h = 2000, 2, 20, 7, 64
    cfg = TransducerConfig(vocab_size=v, hidden_size=h,
                           joint_space_size=128)
    p = init_transducer_params(jax.random.PRNGKey(0), cfg, encoder_size=96)
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(b, t, 96).astype(np.float32) * 0.3,
                      jnp.bfloat16)
    dec = jnp.asarray(rng.randn(b, u + 1, h).astype(np.float32) * 0.3,
                      jnp.bfloat16)
    targets = jnp.asarray(rng.randint(1, v, (b, u)), jnp.int32)
    t_lens = jnp.asarray([t, t - 4])
    u_lens = jnp.asarray([u, u - 2])

    def ref(p):
        logits = joint_lattice(
            p, cfg, enc.astype(jnp.float32), dec.astype(jnp.float32)
        )
        return rnnt_loss(logits, targets, t_lens, u_lens)

    def stream(p):
        bl, em = _blank_emit_streaming(p, cfg, enc, dec, targets, 0)
        return rnnt_loss_from_blank_emit(bl, em, t_lens, u_lens)

    lr, ls = float(ref(p)), float(stream(p))
    assert abs(lr - ls) < 3e-3 * abs(lr), (lr, ls)
    gr = jax.grad(ref)(p)["joint"]
    gs = jax.grad(stream)(p)["joint"]
    for kp, a in jax.tree_util.tree_flatten_with_path(gs)[0]:
        refs = dict(
            (jax.tree_util.keystr(k), val)
            for k, val in jax.tree_util.tree_flatten_with_path(gr)[0]
        )
        r = refs[jax.tree_util.keystr(kp)]
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        np.testing.assert_allclose(
            a, r, atol=max(3e-2 * np.abs(r).max(), 1e-3),
            err_msg=jax.tree_util.keystr(kp),
        )


def test_streaming_lse_dp_sharded_grads():
    """The custom_partitioning psum path: batch-sharded rows on the
    8-device mesh produce the SAME dW/db as single-device (the per-shard
    partials must be all-reduced inside the partition lower fn)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n, k, v = 512, 128, 700
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, k).astype(np.float32) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, v).astype(np.float32) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(n).astype(np.float32))

    def loss(x_, w_, b_):
        return jnp.sum(vl.streaming_lse(x_, w_, b_, True) * g)

    ref = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    bs = jax.device_put(b, NamedSharding(mesh, P()))
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xs, ws, bs)
    for name, a, r in zip("dx dw db".split(), got, ref):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        # 1%-of-max: 8 per-shard partial matmuls + psum accumulate in a
        # different order than one 512-row matmul. A MISSING psum would
        # be ~8x off on every element — also asserted explicitly:
        assert np.abs(a).max() > 0.4 * np.abs(r).max(), (name, "psum lost?")
        np.testing.assert_allclose(
            a, r, atol=max(1e-2 * np.abs(r).max(), 1e-4), err_msg=name
        )
