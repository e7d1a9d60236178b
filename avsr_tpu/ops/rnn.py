"""Fused-gate recurrent cells and time scans, TPU-first.

Replaces the reference's ``dynamic_rnn`` / ``bidirectional_dynamic_rnn`` +
per-step kernel dispatch (upstream:avsr/encoder.py + avsr/cells.py,
SURVEY.md §2.2 rows 3/7 and §2.3 row 1) with:

  * one fused gate matmul per step — the 4 LSTM gates (3 GRU gates) are a
    single ``h @ W_h`` MXU matmul inside the scan;
  * the input projection ``x @ W_x`` for ALL timesteps hoisted OUT of the
    scan as one large batched matmul (the classic TPU RNN trick: the scan
    body touches only the [H, 4H] recurrent weights);
  * time-major [T, B, ...] layout so the scan carry is contiguous;
  * bf16 matmuls with fp32 cell state (``preferred_element_type=float32``);
  * masking by carry-through: padded steps keep the previous (h, c), so a
    reversed scan over a right-padded sequence starts from the true end.

The whole scanned network compiles into a single XLA program per train/eval
step [BASELINE.json:north_star].
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.utils.params import Params, glorot_uniform, orthogonal

# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def lstm_init(
    key, input_dim: int, hidden: int, dtype=jnp.float32, layer_norm: bool = False
) -> Params:
    k1, k2 = jax.random.split(key)
    bias = jnp.zeros((4 * hidden,), dtype)
    # Forget-gate bias = 1 (gate order: i, f, g, o).
    bias = bias.at[hidden : 2 * hidden].set(1.0)
    params = {
        "wx": glorot_uniform(k1, (input_dim, 4 * hidden), dtype),
        "wh": orthogonal(k2, (hidden, 4 * hidden), dtype),
        "b": bias,
    }
    if layer_norm:
        # LayerNormBasicLSTMCell-style: normalize each gate block's
        # preactivations and the new cell state before the output gate.
        params["ln_gamma"] = jnp.ones((4 * hidden,), dtype)
        params["ln_cell_gamma"] = jnp.ones((hidden,), dtype)
        params["ln_cell_beta"] = jnp.zeros((hidden,), dtype)
    return params


def _gate_layer_norm(gates: jnp.ndarray, gamma: jnp.ndarray, hidden: int,
                     eps: float = 1e-5) -> jnp.ndarray:
    """Normalize each of the 4 gate blocks independently."""
    g = gates.reshape(*gates.shape[:-1], 4, hidden)
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.var(g, axis=-1, keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(*gates.shape[:-1], 4 * hidden) * gamma


def gru_init(key, input_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "wx": glorot_uniform(k1, (input_dim, 3 * hidden), dtype),
        "wh": orthogonal(k2, (hidden, 3 * hidden), dtype),
        "b": jnp.zeros((3 * hidden,), dtype),
    }


def cell_init(
    cell_type: str, key, input_dim: int, hidden: int, dtype=jnp.float32,
    layer_norm: bool = False,
):
    if cell_type == "lstm":
        return lstm_init(key, input_dim, hidden, dtype, layer_norm=layer_norm)
    if cell_type == "gru":
        return gru_init(key, input_dim, hidden, dtype)
    raise ValueError(f"unknown cell type {cell_type}")


# ---------------------------------------------------------------------------
# Single-step cells (used by scans AND by the step-wise decoders)
# ---------------------------------------------------------------------------


def lstm_step(
    params: Params,
    x_or_xw: jnp.ndarray,
    state: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    preprojected: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """One fused LSTM step.

    Args:
      x_or_xw: [B, D_in] input, or [B, 4H] pre-projected x@Wx if
        ``preprojected``.
      state: (h [B, H] fp32, c [B, H] fp32).

    Returns ((h', c'), h').
    """
    h, c = state
    H = h.shape[-1]
    wh = params["wh"].astype(compute_dtype)
    if preprojected:
        xw = x_or_xw
    else:
        xw = jnp.dot(
            x_or_xw.astype(compute_dtype),
            params["wx"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    gates = xw + jnp.dot(
        h.astype(compute_dtype), wh, preferred_element_type=jnp.float32
    )
    if "ln_gamma" in params:
        gates = _gate_layer_norm(gates, params["ln_gamma"], H)
    gates = gates + params["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    c_for_out = c_new
    if "ln_cell_gamma" in params:
        mean = jnp.mean(c_new, axis=-1, keepdims=True)
        var = jnp.var(c_new, axis=-1, keepdims=True)
        c_for_out = (
            (c_new - mean) * jax.lax.rsqrt(var + 1e-5)
        ) * params["ln_cell_gamma"] + params["ln_cell_beta"]
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_for_out)
    return (h_new, c_new), h_new


def gru_step(
    params: Params,
    x_or_xw: jnp.ndarray,
    state: jnp.ndarray,
    *,
    preprojected: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused GRU step (gate order: r, z, n). state = h [B, H] fp32."""
    h = state
    H = h.shape[-1]
    wh = params["wh"].astype(compute_dtype)
    if preprojected:
        xw = x_or_xw
    else:
        xw = jnp.dot(
            x_or_xw.astype(compute_dtype),
            params["wx"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    hw = jnp.dot(h.astype(compute_dtype), wh, preferred_element_type=jnp.float32)
    xr, xz, xn = jnp.split(xw + params["b"], 3, axis=-1)
    hr, hz, hn = jnp.split(hw, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h
    return h_new, h_new


# ---------------------------------------------------------------------------
# Custom-VJP LSTM scan core
#
# JAX's default scan backward saves every per-step linearization residual
# (gate activations etc.) in fp32 — the dominant HBM traffic of the training
# step.  This hand-written VJP saves only the bf16 (xw, h, c) step carries
# and RECOMPUTES the gates in the backward scan (one extra [B,H]x[H,4H]
# matmul per step — MXU-cheap, bandwidth-free).  Numerics are pinned against
# jax.grad of the reference scan in tests/test_rnn.py.
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _lstm_scan_core(wh, b, xw, mask, init, compute_dtype):
    """(ys, hT, cT) for a masked fused-gate LSTM scan.

    Args: wh [H,4H], b [4H], xw [T,B,4H] (pre-projected inputs, any float
    dtype), mask [T,B] fp32, init (h0, c0) fp32.
    """
    (ys, hT, cT), _ = _lstm_scan_core_fwd_impl(wh, b, xw, mask, init,
                                               compute_dtype, save=False)
    return ys, hT, cT


def _lstm_scan_core_fwd_impl(wh, b, xw, mask, init, compute_dtype, save):
    h0, c0 = init
    wh_c = wh.astype(compute_dtype)

    def body(carry, inp):
        h, c = carry
        xw_t, m_t = inp
        gates = (
            xw_t.astype(jnp.float32)
            + jnp.dot(h.astype(compute_dtype), wh_c,
                      preferred_element_type=jnp.float32)
            + b
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[:, None]
        h_out = m * h_new + (1.0 - m) * h
        c_out = m * c_new + (1.0 - m) * c
        outs = (h_new * m).astype(compute_dtype)
        if save:
            # residuals: the carries ENTERING this step, in compute dtype
            outs = (outs, h.astype(compute_dtype), c.astype(compute_dtype))
        return (h_out, c_out), outs

    (hT, cT), ys = jax.lax.scan(body, (h0, c0), (xw, mask))
    if save:
        ys, h_res, c_res = ys
        return (ys, hT, cT), (h_res, c_res)
    return (ys, hT, cT), None


def _lstm_scan_core_fwd(wh, b, xw, mask, init, compute_dtype):
    out, (h_res, c_res) = _lstm_scan_core_fwd_impl(
        wh, b, xw, mask, init, compute_dtype, save=True
    )
    return out, (wh, b, xw, mask, h_res, c_res)


def _lstm_scan_core_bwd(compute_dtype, res, cot):
    wh, b, xw, mask, h_res, c_res = res
    dys, dhT, dcT = cot
    T, B, H = h_res.shape
    wh_c = wh.astype(compute_dtype)
    whT_c = wh.T.astype(compute_dtype)

    def body(carry, inp):
        dh_out, dc_out, db_acc = carry
        xw_t, m_t, h_prev_s, c_prev_s, dys_t = inp
        c_prev = c_prev_s.astype(jnp.float32)
        m = m_t[:, None]
        # recompute forward gates for this step
        gates = (
            xw_t.astype(jnp.float32)
            + jnp.dot(h_prev_s, wh_c, preferred_element_type=jnp.float32)
            + b
        )
        gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(gi), jax.nn.sigmoid(gf), jax.nn.sigmoid(go)
        g = jnp.tanh(gg)
        c_new = f * c_prev + i * g
        tc = jnp.tanh(c_new)

        dh_new = (dh_out + dys_t.astype(jnp.float32)) * m
        dh_prev_direct = dh_out * (1.0 - m)
        dc_new = dc_out * m
        dc_prev_direct = dc_out * (1.0 - m)

        do = dh_new * tc
        dc_new = dc_new + dh_new * o * (1.0 - tc * tc)
        df = dc_new * c_prev
        di = dc_new * g
        dg = dc_new * i
        dc_prev = dc_new * f + dc_prev_direct

        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dgates_c = dgates.astype(compute_dtype)
        dh_prev = (
            jnp.dot(dgates_c, whT_c, preferred_element_type=jnp.float32)
            + dh_prev_direct
        )
        db_acc = db_acc + jnp.sum(dgates, axis=0)
        return (dh_prev, dc_prev, db_acc), dgates_c

    carry0 = (
        dhT.astype(jnp.float32),
        dcT.astype(jnp.float32),
        jnp.zeros_like(b, jnp.float32),
    )
    (dh0, dc0, db), dxw = jax.lax.scan(
        body, carry0, (xw, mask, h_res, c_res, dys), reverse=True
    )
    # dWh hoisted OUT of the scan: dxw IS dgates, so the per-step
    # [H,B]x[B,4H] accumulation (plus its [H,4H] fp32 carry) collapses into
    # one large MXU matmul over all timesteps — same math, f32-accumulated.
    dwh = jnp.einsum(
        "tbh,tbk->hk", h_res, dxw, preferred_element_type=jnp.float32
    )
    return (
        dwh.astype(wh.dtype),
        db.astype(b.dtype),
        dxw.astype(xw.dtype),
        jnp.zeros_like(mask),
        (dh0, dc0),
    )


_lstm_scan_core.defvjp(_lstm_scan_core_fwd, _lstm_scan_core_bwd)


# ---------------------------------------------------------------------------
# Fused-direction BiLSTM custom-VJP core
#
# The per-step cost of these scans is LATENCY-bound, not FLOP-bound (measured
# on v5e: a lone [128,256]x[256,1024] step and a G=2-batched step cost nearly
# the same — RESULTS.md round 2).  Running BOTH BiLSTM
# directions inside ONE scan therefore halves each layer's sequential depth
# for free.  Round 1 had the fused forward (fused_bilstm_scan) and the
# custom VJP separately but never together; this core combines them: G=2
# batched gate matmuls in the forward scan AND in the hand-written backward
# scan (bf16 residuals, gate recompute — same contract as _lstm_scan_core).
# ---------------------------------------------------------------------------


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _bilstm_scan_core(wh, b, xw, mask, init, compute_dtype):
    """(ys, hT, cT) for a direction-batched masked LSTM scan.

    Args: wh [2,H,4H], b [2,4H], xw [T,2,B,4H] (backward direction's stream
    pre-flipped in time), mask [T,2,B] fp32, init (h0, c0) [2,B,H] fp32.
    """
    (ys, hT, cT), _ = _bilstm_scan_core_fwd_impl(wh, b, xw, mask, init,
                                                 compute_dtype, save=False)
    return ys, hT, cT


def _bilstm_scan_core_fwd_impl(wh, b, xw, mask, init, compute_dtype, save):
    h0, c0 = init
    wh_c = wh.astype(compute_dtype)
    b_e = b[:, None, :]

    def body(carry, inp):
        h, c = carry                                      # [2, B, H]
        xw_t, m_t = inp                                   # [2, B, 4H], [2, B]
        gates = (
            xw_t.astype(jnp.float32)
            + jnp.einsum("gbh,ghk->gbk", h.astype(compute_dtype), wh_c,
                         preferred_element_type=jnp.float32)
            + b_e
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[..., None]
        h_out = m * h_new + (1.0 - m) * h
        c_out = m * c_new + (1.0 - m) * c
        outs = (h_new * m).astype(compute_dtype)
        if save:
            outs = (outs, h.astype(compute_dtype), c.astype(compute_dtype))
        return (h_out, c_out), outs

    (hT, cT), ys = jax.lax.scan(body, (h0, c0), (xw, mask))
    if save:
        ys, h_res, c_res = ys
        return (ys, hT, cT), (h_res, c_res)
    return (ys, hT, cT), None


def _bilstm_scan_core_fwd(wh, b, xw, mask, init, compute_dtype):
    out, (h_res, c_res) = _bilstm_scan_core_fwd_impl(
        wh, b, xw, mask, init, compute_dtype, save=True
    )
    return out, (wh, b, xw, mask, h_res, c_res)


def _bilstm_scan_core_bwd(compute_dtype, res, cot):
    wh, b, xw, mask, h_res, c_res = res
    dys, dhT, dcT = cot
    wh_c = wh.astype(compute_dtype)
    b_e = b[:, None, :]

    def body(carry, inp):
        dh_out, dc_out, db_acc = carry
        xw_t, m_t, h_prev_s, c_prev_s, dys_t = inp
        c_prev = c_prev_s.astype(jnp.float32)
        m = m_t[..., None]
        gates = (
            xw_t.astype(jnp.float32)
            + jnp.einsum("gbh,ghk->gbk", h_prev_s, wh_c,
                         preferred_element_type=jnp.float32)
            + b_e
        )
        gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(gi), jax.nn.sigmoid(gf), jax.nn.sigmoid(go)
        g = jnp.tanh(gg)
        c_new = f * c_prev + i * g
        tc = jnp.tanh(c_new)

        dh_new = (dh_out + dys_t.astype(jnp.float32)) * m
        dh_prev_direct = dh_out * (1.0 - m)
        dc_new = dc_out * m
        dc_prev_direct = dc_out * (1.0 - m)

        do = dh_new * tc
        dc_new = dc_new + dh_new * o * (1.0 - tc * tc)
        df = dc_new * c_prev
        di = dc_new * g
        dg = dc_new * i
        dc_prev = dc_new * f + dc_prev_direct

        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dgates_c = dgates.astype(compute_dtype)
        dh_prev = (
            jnp.einsum("gbk,ghk->gbh", dgates_c, wh_c,
                       preferred_element_type=jnp.float32)
            + dh_prev_direct
        )
        db_acc = db_acc + jnp.sum(dgates, axis=1)
        return (dh_prev, dc_prev, db_acc), dgates_c

    carry0 = (
        dhT.astype(jnp.float32),
        dcT.astype(jnp.float32),
        jnp.zeros_like(b, jnp.float32),
    )
    (dh0, dc0, db), dxw = jax.lax.scan(
        body, carry0, (xw, mask, h_res, c_res, dys), reverse=True
    )
    # dWh hoisted OUT of the scan (see _lstm_scan_core_bwd): one big
    # direction-batched MXU matmul over all timesteps.
    dwh = jnp.einsum(
        "tgbh,tgbk->ghk", h_res, dxw, preferred_element_type=jnp.float32
    )
    return (
        dwh.astype(wh.dtype),
        db.astype(b.dtype),
        dxw.astype(xw.dtype),
        jnp.zeros_like(mask),
        (dh0, dc0),
    )


_bilstm_scan_core.defvjp(_bilstm_scan_core_fwd, _bilstm_scan_core_bwd)

# Toggle for the custom-VJP path (plain LSTM, no LN, no recurrent dropout).
USE_CUSTOM_VJP = True


# ---------------------------------------------------------------------------
# Scans
# ---------------------------------------------------------------------------


def _project_inputs(params: Params, x_tbd: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Hoisted input projection: [T, B, D] @ [D, G*H] as one matmul.

    Accumulates in fp32 on the MXU but STORES the result in compute_dtype:
    this [T, B, 4H] tensor is the largest HBM resident of every scan (read
    in forward, saved for backward) — bf16 storage halves that traffic.
    The per-step gate sum upcasts back to fp32.
    """
    out = jnp.einsum(
        "tbd,dg->tbg",
        x_tbd.astype(compute_dtype),
        params["wx"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(compute_dtype)


def lstm_scan(
    params: Params,
    x_tbd: jnp.ndarray,
    mask_tb: Optional[jnp.ndarray] = None,
    initial_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    *,
    reverse: bool = False,
    compute_dtype=jnp.bfloat16,
    unroll: int = 1,
    recurrent_dropout_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Scan an LSTM over time.

    Args:
      x_tbd: [T, B, D] time-major inputs.
      mask_tb: [T, B] float/bool validity mask (1 = valid).  Padded steps
        carry the previous state through unchanged and emit zeros.
      reverse: scan from t=T-1 down to 0 (for the backward direction of a
        BiLSTM). Outputs remain in forward time order.

    Returns:
      outputs [T, B, H] fp32 (zeros at padded steps), final (h, c).
    """
    T, B, _ = x_tbd.shape
    H = params["wh"].shape[0]
    xw = _project_inputs(params, x_tbd, compute_dtype)
    if initial_state is None:
        h0 = jnp.zeros((B, H), jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)
    else:
        h0, c0 = initial_state
    if mask_tb is None:
        mask_tb = jnp.ones((T, B), jnp.float32)
    mask_tb = mask_tb.astype(jnp.float32)

    if (
        USE_CUSTOM_VJP
        and "ln_gamma" not in params
        and recurrent_dropout_mask is None
        and unroll == 1
    ):
        xw_in = jnp.flip(xw, axis=0) if reverse else xw
        m_in = jnp.flip(mask_tb, axis=0) if reverse else mask_tb
        ys, hT, cT = _lstm_scan_core(
            params["wh"], params["b"], xw_in, m_in, (h0, c0), compute_dtype
        )
        if reverse:
            ys = jnp.flip(ys, axis=0)
        return ys, (hT, cT)

    def body(carry, inp):
        h, c = carry
        xw_t, m_t = inp
        h_in = h if recurrent_dropout_mask is None else h * recurrent_dropout_mask
        (h_new, c_new), _ = lstm_step(
            params, xw_t, (h_in, c), preprojected=True,
            compute_dtype=compute_dtype,
        )
        m = m_t[:, None]
        h_out = m * h_new + (1.0 - m) * h
        c_out = m * c_new + (1.0 - m) * c
        # outputs stored in compute_dtype: halves the [T, B, H] HBM traffic
        return (h_out, c_out), (h_new * m).astype(compute_dtype)

    (hT, cT), ys = jax.lax.scan(
        body, (h0, c0), (xw, mask_tb), reverse=reverse, unroll=unroll
    )
    return ys, (hT, cT)


def gru_scan(
    params: Params,
    x_tbd: jnp.ndarray,
    mask_tb: Optional[jnp.ndarray] = None,
    initial_state: Optional[jnp.ndarray] = None,
    *,
    reverse: bool = False,
    compute_dtype=jnp.bfloat16,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GRU counterpart of :func:`lstm_scan`. Final state is h only."""
    T, B, _ = x_tbd.shape
    H = params["wh"].shape[0]
    xw = _project_inputs(params, x_tbd, compute_dtype)
    h0 = (
        jnp.zeros((B, H), jnp.float32) if initial_state is None else initial_state
    )
    if mask_tb is None:
        mask_tb = jnp.ones((T, B), jnp.float32)
    mask_tb = mask_tb.astype(jnp.float32)

    def body(h, inp):
        xw_t, m_t = inp
        h_new, _ = gru_step(
            params, xw_t, h, preprojected=True, compute_dtype=compute_dtype
        )
        m = m_t[:, None]
        h_out = m * h_new + (1.0 - m) * h
        return h_out, (h_new * m).astype(compute_dtype)

    hT, ys = jax.lax.scan(body, h0, (xw, mask_tb), reverse=reverse, unroll=unroll)
    return ys, hT


def rnn_scan(cell_type: str, params: Params, *args, **kwargs):
    if cell_type == "lstm":
        return lstm_scan(params, *args, **kwargs)
    if cell_type == "gru":
        return gru_scan(params, *args, **kwargs)
    raise ValueError(f"unknown cell type {cell_type}")


def fused_bilstm_scan(
    params_fwd: Params,
    params_bwd: Params,
    x_tbd: jnp.ndarray,
    mask_tb: Optional[jnp.ndarray],
    *,
    compute_dtype=jnp.bfloat16,
    unroll: int = 1,
    recurrent_dropout_masks: Optional[Tuple] = None,
) -> Tuple[jnp.ndarray, Tuple]:
    """Both BiLSTM directions in ONE lax.scan.

    The backward direction's (pre-projected) input stream and mask are
    time-flipped so a single forward scan computes both directions; the
    per-step recurrent matmul becomes a G=2 batched matmul
    (einsum 'gbh,ghk->gbk') that feeds the MXU twice the work per step.
    Halves the number of sequential scan regions vs two separate scans.
    Equivalence with bidirectional_scan is pinned in tests/test_rnn.py.
    """
    T, B, _ = x_tbd.shape
    H = params_fwd["wh"].shape[0]
    if mask_tb is None:
        mask_tb = jnp.ones((T, B), jnp.float32)
    mask_tb = mask_tb.astype(jnp.float32)

    xw_f = _project_inputs(params_fwd, x_tbd, compute_dtype)      # [T, B, 4H]
    xw_b = _project_inputs(params_bwd, x_tbd, compute_dtype)
    xw = jnp.stack([xw_f, jnp.flip(xw_b, axis=0)], axis=1)         # [T, 2, B, 4H]
    mask2 = jnp.stack([mask_tb, jnp.flip(mask_tb, axis=0)], axis=1)  # [T, 2, B]

    if (
        USE_CUSTOM_VJP
        and recurrent_dropout_masks is None
        and unroll == 1
        and "ln_gamma" not in params_fwd
    ):
        wh2 = jnp.stack([params_fwd["wh"], params_bwd["wh"]], axis=0)
        b2 = jnp.stack([params_fwd["b"], params_bwd["b"]], axis=0)
        h0 = jnp.zeros((2, B, H), jnp.float32)
        c0 = jnp.zeros((2, B, H), jnp.float32)
        ys, hT, cT = _bilstm_scan_core(
            wh2, b2, xw, mask2, (h0, c0), compute_dtype
        )
        ys_f = ys[:, 0]
        ys_b = jnp.flip(ys[:, 1], axis=0)
        out = jnp.concatenate([ys_f, ys_b], axis=-1)
        return out, ((hT[0], cT[0]), (hT[1], cT[1]))

    wh = jnp.stack(
        [params_fwd["wh"], params_bwd["wh"]], axis=0
    ).astype(compute_dtype)                                        # [2, H, 4H]
    b = jnp.stack([params_fwd["b"], params_bwd["b"]], axis=0)      # [2, 4H]

    rd = None
    if recurrent_dropout_masks is not None:
        rd = jnp.stack(recurrent_dropout_masks, axis=0)            # [2, B, H]

    def body(carry, inp):
        h, c = carry                                               # [2, B, H]
        xw_t, m_t = inp
        h_in = h if rd is None else h * rd
        gates = xw_t + jnp.einsum(
            "gbh,ghk->gbk", h_in.astype(compute_dtype), wh,
            preferred_element_type=jnp.float32,
        ) + b[:, None, :]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = m_t[..., None]
        h_out = m * h_new + (1.0 - m) * h
        c_out = m * c_new + (1.0 - m) * c
        return (h_out, c_out), (h_new * m).astype(compute_dtype)

    h0 = jnp.zeros((2, B, H), jnp.float32)
    c0 = jnp.zeros((2, B, H), jnp.float32)
    (hT, cT), ys = jax.lax.scan(body, (h0, c0), (xw, mask2), unroll=unroll)
    ys_f = ys[:, 0]                                                # [T, B, H]
    ys_b = jnp.flip(ys[:, 1], axis=0)
    out = jnp.concatenate([ys_f, ys_b], axis=-1)
    state_f = (hT[0], cT[0])
    state_b = (hT[1], cT[1])
    return out, (state_f, state_b)


def multi_fused_bilstm_scan(
    streams,
    *,
    compute_dtype=jnp.bfloat16,
):
    """Run N INDEPENDENT BiLSTM layers in ONE scan (G = 2N gate matmuls).

    TPU cores execute one op at a time — two separate ``lax.scan`` regions
    SERIALIZE even when data-independent, so e.g. the audio encoder's first
    layer and the video encoder's first layer (independent chains, same
    hidden size) otherwise pay T_audio + T_video sequential steps.  Batching
    them onto the direction axis of :func:`_bilstm_scan_core` pays
    max(T_audio, T_video) steps instead; the per-step cost is latency-bound
    at these sizes (RESULTS.md round 2), so a G=4 step costs about the same
    as G=2.  (True cross-LAYER wavefronting is impossible for bidirectional
    stacks: layer k+1 at t=0 needs layer k's backward output at t=0, which
    is only available after layer k's full scan.)

    Args:
      streams: list of (params_fwd, params_bwd, x_tbd [T_i, B, D_i],
        mask_tb [T_i, B] or None).  All streams must share B and the hidden
        size H; time lengths and input dims may differ (shorter streams are
        zero-padded and masked — carry-through keeps their states exact).
        Cells must be plain LSTM (no layer norm).

    Returns: list of (out [T_i, B, 2H] as concat(fwd, bwd),
                      ((hT_f, cT_f), (hT_b, cT_b))) per stream.
    """
    assert streams, "multi_fused_bilstm_scan needs at least one stream"
    B = streams[0][2].shape[1]
    H = streams[0][0]["wh"].shape[0]
    Ts = [s[2].shape[0] for s in streams]
    T_max = max(Ts)

    xws, masks, whs, bs = [], [], [], []
    for params_fwd, params_bwd, x_tbd, mask_tb in streams:
        T = x_tbd.shape[0]
        if mask_tb is None:
            mask_tb = jnp.ones((T, B), jnp.float32)
        mask_tb = mask_tb.astype(jnp.float32)
        xw_f = _project_inputs(params_fwd, x_tbd, compute_dtype)
        xw_b = _project_inputs(params_bwd, x_tbd, compute_dtype)
        pad = T_max - T
        if pad:
            pz = ((0, pad), (0, 0), (0, 0))
            xw_f = jnp.pad(xw_f, pz)
            xw_b = jnp.pad(xw_b, pz)
            mask_tb = jnp.pad(mask_tb, ((0, pad), (0, 0)))
        # backward direction consumes the time-flipped padded stream; the
        # pad lands at the START with mask 0, so the zero init state carries
        # through until the true last frame (same scheme as
        # fused_bilstm_scan on right-padded utterances).
        xws += [xw_f, jnp.flip(xw_b, axis=0)]
        masks += [mask_tb, jnp.flip(mask_tb, axis=0)]
        whs += [params_fwd["wh"], params_bwd["wh"]]
        bs += [params_fwd["b"], params_bwd["b"]]

    xw = jnp.stack(xws, axis=1)        # [T_max, G, B, 4H]
    mask = jnp.stack(masks, axis=1)    # [T_max, G, B]
    wh = jnp.stack(whs, axis=0)        # [G, H, 4H]
    b = jnp.stack(bs, axis=0)          # [G, 4H]
    G = len(xws)
    h0 = jnp.zeros((G, B, H), jnp.float32)
    c0 = jnp.zeros((G, B, H), jnp.float32)
    ys, hT, cT = _bilstm_scan_core(wh, b, xw, mask, (h0, c0), compute_dtype)

    outs = []
    for i, T in enumerate(Ts):
        gf, gb = 2 * i, 2 * i + 1
        ys_f = ys[:T, gf]
        ys_b = jnp.flip(ys[:, gb], axis=0)[:T]
        out = jnp.concatenate([ys_f, ys_b], axis=-1)
        outs.append((out, ((hT[gf], cT[gf]), (hT[gb], cT[gb]))))
    return outs


def bidirectional_scan(
    cell_type: str,
    params_fwd: Params,
    params_bwd: Params,
    x_tbd: jnp.ndarray,
    mask_tb: Optional[jnp.ndarray],
    *,
    compute_dtype=jnp.bfloat16,
    unroll: int = 1,
    recurrent_dropout_masks: Optional[Tuple] = None,
) -> Tuple[jnp.ndarray, Tuple]:
    """Bidirectional RNN: concat(fwd, bwd) along features.

    The backward scan uses ``reverse=True`` with the same mask; because
    padding is on the right and padded steps carry state through, the
    backward pass correctly starts at each utterance's true last frame.
    """
    # Plain LSTM: take the fused single-scan path — one sequential loop
    # computes BOTH directions.  Per-step cost is latency-bound at this
    # size, so halving the sequential depth beats two scans even though the
    # per-step matmul doubles; with USE_CUSTOM_VJP the fused core's
    # hand-written backward (G=2-batched gate recompute) keeps the same
    # advantage in the backward scan.  Measured in RESULTS.md.
    if cell_type == "lstm" and "ln_gamma" not in params_fwd:
        return fused_bilstm_scan(
            params_fwd, params_bwd, x_tbd, mask_tb,
            compute_dtype=compute_dtype, unroll=unroll,
            recurrent_dropout_masks=recurrent_dropout_masks,
        )
    rd_f = rd_b = None
    if recurrent_dropout_masks is not None:
        rd_f, rd_b = recurrent_dropout_masks
    kw = dict(compute_dtype=compute_dtype, unroll=unroll)
    if cell_type == "lstm":
        kw_f = dict(kw, recurrent_dropout_mask=rd_f)
        kw_b = dict(kw, recurrent_dropout_mask=rd_b)
    else:
        kw_f = kw_b = kw
    ys_f, state_f = rnn_scan(cell_type, params_fwd, x_tbd, mask_tb, **kw_f)
    ys_b, state_b = rnn_scan(
        cell_type, params_bwd, x_tbd, mask_tb, reverse=True, **kw_b
    )
    return jnp.concatenate([ys_f, ys_b], axis=-1), (state_f, state_b)
