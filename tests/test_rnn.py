"""RNN scan numerics vs hand-rolled NumPy LSTM/GRU (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.ops import rnn


def np_lstm(params, x_tbd, mask_tb):
    wx = np.asarray(params["wx"], np.float64)
    wh = np.asarray(params["wh"], np.float64)
    b = np.asarray(params["b"], np.float64)
    T, B, _ = x_tbd.shape
    H = wh.shape[0]
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    outs = np.zeros((T, B, H))

    def sig(z):
        return 1.0 / (1.0 + np.exp(-z))

    for t in range(T):
        gates = x_tbd[t] @ wx + h @ wh + b
        i, f, g, o = np.split(gates, 4, axis=-1)
        c_new = sig(f) * c + sig(i) * np.tanh(g)
        h_new = sig(o) * np.tanh(c_new)
        m = mask_tb[t][:, None]
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        outs[t] = h_new * m
    return outs, (h, c)


def test_lstm_scan_matches_numpy(rng):
    T, B, D, H = 7, 3, 5, 4
    key = jax.random.PRNGKey(0)
    params = rnn.lstm_init(key, D, H)
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    mask = np.ones((T, B), np.float32)
    mask[5:, 1] = 0.0  # one short sequence
    ys, (h, c) = rnn.lstm_scan(
        params, jnp.asarray(x), jnp.asarray(mask), compute_dtype=jnp.float32
    )
    ref_ys, (ref_h, ref_c) = np_lstm(params, x.astype(np.float64), mask)
    np.testing.assert_allclose(np.asarray(ys), ref_ys, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ref_c, rtol=1e-4, atol=1e-5)


def test_lstm_masking_carries_state(rng):
    """Final state of a masked sequence equals that of its unpadded version."""
    T, B, D, H = 10, 1, 3, 4
    params = rnn.lstm_init(jax.random.PRNGKey(1), D, H)
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    mask = np.zeros((T, B), np.float32)
    mask[:6] = 1.0
    _, (h_m, c_m) = rnn.lstm_scan(
        params, jnp.asarray(x), jnp.asarray(mask), compute_dtype=jnp.float32
    )
    _, (h_s, c_s) = rnn.lstm_scan(
        params, jnp.asarray(x[:6]), jnp.ones((6, B), jnp.float32),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(h_m), np.asarray(h_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_m), np.asarray(c_s), rtol=1e-5)


def test_reverse_scan_starts_at_true_end(rng):
    """Backward direction over right-padded input == backward over the
    unpadded sequence (padding must not corrupt the carry)."""
    T, B, D, H = 8, 1, 3, 4
    params = rnn.lstm_init(jax.random.PRNGKey(2), D, H)
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    valid = 5
    mask = np.zeros((T, B), np.float32)
    mask[:valid] = 1.0
    ys_pad, (h_pad, _) = rnn.lstm_scan(
        params, jnp.asarray(x), jnp.asarray(mask), reverse=True,
        compute_dtype=jnp.float32,
    )
    ys_ref, (h_ref, _) = rnn.lstm_scan(
        params, jnp.asarray(x[:valid]), jnp.ones((valid, B), jnp.float32),
        reverse=True, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ys_pad)[:valid], np.asarray(ys_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(ys_pad)[valid:], 0.0, atol=1e-7)


def test_gru_scan_shapes_and_mask(rng):
    T, B, D, H = 6, 2, 4, 5
    params = rnn.gru_init(jax.random.PRNGKey(3), D, H)
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    mask = np.ones((T, B), np.float32)
    mask[4:, 0] = 0.0
    ys, h = rnn.gru_scan(
        params, jnp.asarray(x), jnp.asarray(mask), compute_dtype=jnp.float32
    )
    assert ys.shape == (T, B, H)
    np.testing.assert_allclose(np.asarray(ys)[4:, 0], 0.0, atol=1e-7)
    # final state for row 0 equals output at t=3
    np.testing.assert_allclose(
        np.asarray(h)[0], np.asarray(ys)[3, 0], rtol=1e-5
    )


def test_bidirectional_concat(rng):
    """bidirectional_scan (fused single-scan path) == two separate scans,
    including masked right-padding and final states."""
    T, B, D, H = 6, 3, 3, 4
    kf, kb = jax.random.split(jax.random.PRNGKey(4))
    pf = rnn.lstm_init(kf, D, H)
    pb = rnn.lstm_init(kb, D, H)
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    mask = np.ones((T, B), np.float32)
    mask[4:, 1] = 0.0  # one short sequence exercises the flipped-mask path
    ys, (sf, sb) = rnn.bidirectional_scan(
        "lstm", pf, pb, jnp.asarray(x), jnp.asarray(mask),
        compute_dtype=jnp.float32,
    )
    assert ys.shape == (T, B, 2 * H)
    ys_f, sf_ref = rnn.lstm_scan(pf, jnp.asarray(x), jnp.asarray(mask), compute_dtype=jnp.float32)
    ys_b, sb_ref = rnn.lstm_scan(
        pb, jnp.asarray(x), jnp.asarray(mask), reverse=True, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(ys)[:, :, :H], np.asarray(ys_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys)[:, :, H:], np.asarray(ys_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf[0]), np.asarray(sf_ref[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sb[1]), np.asarray(sb_ref[1]),
                               rtol=1e-5, atol=1e-6)


def test_fused_bilstm_with_recurrent_dropout_masks(rng):
    """Fused path honors per-direction recurrent dropout masks (matches the
    two-scan fallback exactly)."""
    T, B, D, H = 5, 2, 3, 4
    kf, kb = jax.random.split(jax.random.PRNGKey(7))
    pf = rnn.lstm_init(kf, D, H)
    pb = rnn.lstm_init(kb, D, H)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    mask = jnp.ones((T, B), jnp.float32)
    rd = (
        jnp.asarray((rng.random((B, H)) > 0.3).astype(np.float32)),
        jnp.asarray((rng.random((B, H)) > 0.3).astype(np.float32)),
    )
    ys_fused, _ = rnn.fused_bilstm_scan(
        pf, pb, x, mask, compute_dtype=jnp.float32,
        recurrent_dropout_masks=rd,
    )
    ys_f, _ = rnn.lstm_scan(pf, x, mask, compute_dtype=jnp.float32,
                            recurrent_dropout_mask=rd[0])
    ys_b, _ = rnn.lstm_scan(pb, x, mask, reverse=True,
                            compute_dtype=jnp.float32,
                            recurrent_dropout_mask=rd[1])
    H_ = ys_f.shape[-1]
    np.testing.assert_allclose(np.asarray(ys_fused)[:, :, :H_],
                               np.asarray(ys_f), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys_fused)[:, :, H_:],
                               np.asarray(ys_b), rtol=1e-5, atol=1e-6)


def test_layer_norm_lstm_runs_and_differs(rng):
    T, B, D, H = 5, 2, 3, 8
    key = jax.random.PRNGKey(6)
    p_ln = rnn.lstm_init(key, D, H, layer_norm=True)
    p_plain = {k: v for k, v in p_ln.items() if not k.startswith("ln")}
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    mask = jnp.ones((T, B), jnp.float32)
    ys_ln, _ = rnn.lstm_scan(p_ln, x, mask, compute_dtype=jnp.float32)
    ys_pl, _ = rnn.lstm_scan(p_plain, x, mask, compute_dtype=jnp.float32)
    assert np.all(np.isfinite(np.asarray(ys_ln)))
    assert not np.allclose(np.asarray(ys_ln), np.asarray(ys_pl))


def test_custom_vjp_grads_match_autodiff(rng):
    """The hand-written LSTM backward must match jax.grad of the reference
    scan on values AND gradients, including masking and reverse."""
    T, B, D, H = 7, 3, 4, 5
    params = rnn.lstm_init(jax.random.PRNGKey(11), D, H)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    mask = np.ones((T, B), np.float32)
    mask[5:, 1] = 0.0
    mask = jnp.asarray(mask)

    def loss(p, use_cvjp, reverse=False):
        old = rnn.USE_CUSTOM_VJP
        rnn.USE_CUSTOM_VJP = use_cvjp
        try:
            ys, (hT, cT) = rnn.lstm_scan(
                p, x, mask, reverse=reverse, compute_dtype=jnp.float32
            )
        finally:
            rnn.USE_CUSTOM_VJP = old
        # weight every output so all cotangent paths are exercised
        w = jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) / ys.size
        return jnp.sum(ys * w) + jnp.sum(hT * 0.7) + jnp.sum(cT * 1.3)

    for reverse in (False, True):
        v_ref = float(loss(params, False, reverse))
        v_new = float(loss(params, True, reverse))
        np.testing.assert_allclose(v_new, v_ref, rtol=1e-5)
        g_ref = jax.grad(lambda p: loss(p, False, reverse))(params)
        g_new = jax.grad(lambda p: loss(p, True, reverse))(params)
        for k in g_ref:
            np.testing.assert_allclose(
                np.asarray(g_new[k]), np.asarray(g_ref[k]),
                rtol=1e-4, atol=1e-5, err_msg=f"{k} reverse={reverse}",
            )


def test_custom_vjp_initial_state_grads(rng):
    T, B, D, H = 4, 2, 3, 4
    params = rnn.lstm_init(jax.random.PRNGKey(12), D, H)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    mask = jnp.ones((T, B), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))

    def loss(init, use_cvjp):
        old = rnn.USE_CUSTOM_VJP
        rnn.USE_CUSTOM_VJP = use_cvjp
        try:
            ys, (hT, cT) = rnn.lstm_scan(
                params, x, mask, initial_state=init, compute_dtype=jnp.float32
            )
        finally:
            rnn.USE_CUSTOM_VJP = old
        return jnp.sum(ys) + jnp.sum(hT) + jnp.sum(cT * 2.0)

    g_ref = jax.grad(lambda i: loss(i, False))((h0, c0))
    g_new = jax.grad(lambda i: loss(i, True))((h0, c0))
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_jit_vs_nojit(rng):
    T, B, D, H = 6, 2, 4, 4
    params = rnn.lstm_init(jax.random.PRNGKey(5), D, H)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    mask = jnp.ones((T, B), jnp.float32)
    f = lambda p, x, m: rnn.lstm_scan(p, x, m, compute_dtype=jnp.float32)[0]
    np.testing.assert_allclose(
        np.asarray(f(params, x, mask)),
        np.asarray(jax.jit(f)(params, x, mask)),
        rtol=1e-5, atol=1e-6,
    )


def test_fused_bilstm_custom_vjp_grads_match_two_scan(rng):
    """The direction-fused BiLSTM custom VJP must match the two-scan
    custom-VJP path on values AND grads (masked, both directions)."""
    T, B, D, H = 7, 3, 4, 5
    pf = rnn.lstm_init(jax.random.PRNGKey(21), D, H)
    pb = rnn.lstm_init(jax.random.PRNGKey(22), D, H)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    mask = np.ones((T, B), np.float32)
    mask[4:, 0] = 0.0
    mask[6:, 2] = 0.0
    mask = jnp.asarray(mask)

    def loss(params, fused):
        pf_, pb_ = params
        if fused:
            ys, (sf, sb) = rnn.fused_bilstm_scan(
                pf_, pb_, x, mask, compute_dtype=jnp.float32
            )
        else:
            ys_f, sf = rnn.lstm_scan(pf_, x, mask, compute_dtype=jnp.float32)
            ys_b, sb = rnn.lstm_scan(pb_, x, mask, reverse=True,
                                     compute_dtype=jnp.float32)
            ys = jnp.concatenate([ys_f, ys_b], axis=-1)
        w = jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) / ys.size
        return (jnp.sum(ys * w) + jnp.sum(sf[0] * 0.7) + jnp.sum(sf[1])
                + jnp.sum(sb[0] * 1.3) + jnp.sum(sb[1] * 0.5))

    v_two = float(loss((pf, pb), False))
    v_fused = float(loss((pf, pb), True))
    np.testing.assert_allclose(v_fused, v_two, rtol=1e-5)
    g_two = jax.grad(lambda p: loss(p, False))((pf, pb))
    g_fused = jax.grad(lambda p: loss(p, True))((pf, pb))
    for gt, gf in zip(g_two, g_fused):
        for k in gt:
            np.testing.assert_allclose(
                np.asarray(gf[k]), np.asarray(gt[k]),
                rtol=1e-4, atol=1e-5, err_msg=k,
            )


def test_multi_fused_bilstm_matches_per_stream_scans(rng):
    """Independent BiLSTM layers batched into ONE scan (different lengths,
    different input dims) must match per-stream fused scans on values,
    final states, and grads — incl. the padded shorter stream."""
    B, H = 3, 5
    Ta, Da, Tb, Db = 9, 4, 6, 7
    pa_f = rnn.lstm_init(jax.random.PRNGKey(31), Da, H)
    pa_b = rnn.lstm_init(jax.random.PRNGKey(32), Da, H)
    pb_f = rnn.lstm_init(jax.random.PRNGKey(33), Db, H)
    pb_b = rnn.lstm_init(jax.random.PRNGKey(34), Db, H)
    xa = jnp.asarray(rng.standard_normal((Ta, B, Da)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((Tb, B, Db)).astype(np.float32))
    mask_a = np.ones((Ta, B), np.float32)
    mask_a[7:, 0] = 0.0
    mask_b = np.ones((Tb, B), np.float32)
    mask_b[4:, 2] = 0.0
    mask_a, mask_b = jnp.asarray(mask_a), jnp.asarray(mask_b)

    def loss(params, multi):
        pa_f_, pa_b_, pb_f_, pb_b_ = params
        if multi:
            (ya, sa), (yb, sb) = rnn.multi_fused_bilstm_scan(
                [(pa_f_, pa_b_, xa, mask_a), (pb_f_, pb_b_, xb, mask_b)],
                compute_dtype=jnp.float32,
            )
        else:
            ya, sa = rnn.fused_bilstm_scan(pa_f_, pa_b_, xa, mask_a,
                                           compute_dtype=jnp.float32)
            yb, sb = rnn.fused_bilstm_scan(pb_f_, pb_b_, xb, mask_b,
                                           compute_dtype=jnp.float32)
        wa = jnp.arange(ya.size, dtype=jnp.float32).reshape(ya.shape) / ya.size
        wb = jnp.arange(yb.size, dtype=jnp.float32).reshape(yb.shape) / yb.size
        t = jnp.sum(ya * wa) + 1.7 * jnp.sum(yb * wb)
        for s, w in ((sa, 0.7), (sb, 1.3)):
            (hf, cf), (hb_, cb) = s
            t = t + w * (jnp.sum(hf) + jnp.sum(cf) * 0.5
                         + jnp.sum(hb_) * 0.9 + jnp.sum(cb) * 1.1)
        return t

    params = (pa_f, pa_b, pb_f, pb_b)
    np.testing.assert_allclose(
        float(loss(params, True)), float(loss(params, False)), rtol=1e-5
    )
    g_multi = jax.grad(lambda p: loss(p, True))(params)
    g_sep = jax.grad(lambda p: loss(p, False))(params)
    for gm, gs in zip(g_multi, g_sep):
        for k in gm:
            np.testing.assert_allclose(
                np.asarray(gm[k]), np.asarray(gs[k]),
                rtol=1e-4, atol=1e-5, err_msg=k,
            )
