"""Beam search correctness: exhaustive-search equivalence on a toy vocabulary
(SURVEY.md §4.2, §7.3 hard-part 1)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.configs import DecoderConfig
from avsr_tpu.data.units import EOS_ID, GO_ID, PAD_ID
from avsr_tpu.decode.beam import beam_search
from avsr_tpu.decode.greedy import greedy_decode
from avsr_tpu.models import decoder as dec
from avsr_tpu.ops import attention as attn

V = 5  # pad, go, eos, a(3), b(4)
MAXLEN = 3
CFG = DecoderConfig(embedding_dim=4, hidden_units=(6,), attention_units=4,
                    max_label_length=MAXLEN)


def build(rng_seed=0, B=2, S=3, H=5, cfg=CFG):
    rng = np.random.default_rng(rng_seed)
    params = dec.decoder_init(jax.random.PRNGKey(rng_seed), cfg, [H], V)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([S] * B, jnp.int32)
    mem = attn.prepare_memory(
        cfg.attention_type, params["atts"][0], memory, lengths,
        compute_dtype=jnp.float32,
    )
    return params, mem, B


def score_sequence(params, mem, b, seq, cfg=CFG):
    """Teacher-forced log prob of `seq` (which may end with EOS) for batch
    row b, using the same decoder_step as beam search."""
    state = dec.initial_state(cfg, mem.values.shape[0],
                              [mem.values.shape[-1]], max_length=MAXLEN)
    tok = jnp.full((mem.values.shape[0],), GO_ID, jnp.int32)
    total = 0.0
    for t in seq:
        state, logits = dec.decoder_step(
            params, cfg, tok, state, [mem], compute_dtype=jnp.float32
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        total += float(logp[b, t])
        tok = jnp.full((mem.values.shape[0],), t, jnp.int32)
    return total


def exhaustive_best(params, mem, b, cfg=CFG):
    """All sequences of length <= MAXLEN over {3,4} terminated by EOS, plus
    unterminated length-MAXLEN sequences; finished sequences preferred."""
    candidates = []
    for L in range(1, MAXLEN + 1):
        for body in itertools.product([3, 4], repeat=L - 1):
            seq = list(body) + [EOS_ID]
            candidates.append((seq, True))
    for body in itertools.product([3, 4], repeat=MAXLEN):
        candidates.append((list(body), False))
    best_fin, best_fin_score = None, -np.inf
    for seq, finished in candidates:
        s = score_sequence(params, mem, b, seq, cfg=cfg)
        if finished and s > best_fin_score:
            best_fin, best_fin_score = seq, s
    return best_fin, best_fin_score


def test_beam_equals_exhaustive():
    params, mem, B = build()
    # width 16 >= number of finished candidates (1+2+4=7) plus live paths
    res = beam_search(
        params, CFG, [mem], MAXLEN, beam_width=16, length_penalty=0.0,
        compute_dtype=jnp.float32,
    )
    for b in range(B):
        ref_seq, ref_score = exhaustive_best(params, mem, b)
        got = [int(x) for x in np.asarray(res.ids[b]) if x != PAD_ID]
        assert got == ref_seq, f"row {b}: beam {got} != exhaustive {ref_seq}"
        np.testing.assert_allclose(float(res.scores[b]), ref_score, rtol=1e-4)


def test_beam_width_one_equals_greedy():
    params, mem, B = build(rng_seed=1)
    res = beam_search(
        params, CFG, [mem], MAXLEN, beam_width=1, length_penalty=0.0,
        compute_dtype=jnp.float32,
    )
    ids_g, len_g = greedy_decode(params, CFG, [mem], MAXLEN,
                                 compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(res.ids), np.asarray(ids_g))


def test_beam_scores_are_consistent_and_bounded():
    """Soundness at every width: the returned score equals the
    teacher-forced re-score of the returned ids, and never exceeds the
    exhaustive optimum.  (Strict monotonicity in width does NOT hold for
    beam search — wider beams can prune differently — so that is not
    asserted.)"""
    params, mem, B = build(rng_seed=2)
    best = [exhaustive_best(params, mem, b)[1] for b in range(B)]
    for w in (1, 2, 4, 8):
        res = beam_search(
            params, CFG, [mem], MAXLEN, beam_width=w, length_penalty=0.0,
            compute_dtype=jnp.float32,
        )
        for b in range(B):
            seq = [int(x) for x in np.asarray(res.ids[b]) if x != PAD_ID]
            rescored = score_sequence(params, mem, b, seq)
            np.testing.assert_allclose(
                float(res.scores[b]), rescored, rtol=1e-4, atol=1e-4
            )
            assert float(res.scores[b]) <= best[b] + 1e-4


def test_beam_respects_length_penalty():
    params, mem, B = build(rng_seed=3)
    res = beam_search(
        params, CFG, [mem], MAXLEN, beam_width=4, length_penalty=1.0,
        compute_dtype=jnp.float32,
    )
    ids = np.asarray(res.ids)
    # sanity: output is well-formed (EOS-terminated, PAD after EOS)
    for b in range(B):
        row = list(ids[b])
        if EOS_ID in row:
            i = row.index(EOS_ID)
            assert all(x == PAD_ID for x in row[i + 1 :])


def test_early_exit_when_all_beams_finish():
    """The early-exit while_loop stops as soon as every beam has emitted
    EOS (with results identical to the full-horizon run: remaining steps
    only append zero-score EOS continuations).  Force termination by
    biasing the output projection hard toward EOS."""
    params, mem, B = build()
    params = dict(params)
    params["out_b"] = params["out_b"].at[EOS_ID].set(50.0)
    # width 2: step 1 -> [EOS, a]; step 2 -> both beams finished (EOS-cont
    # and aEOS beat any non-EOS continuation under the bias) -> exit.
    short = beam_search(params, CFG, [mem], MAXLEN + 2, beam_width=2,
                        compute_dtype=jnp.float32)
    long = beam_search(params, CFG, [mem], MAXLEN + 20, beam_width=2,
                       compute_dtype=jnp.float32)
    assert int(short.steps) == 2
    assert int(long.steps) == 2   # the extra horizon is never executed
    L = short.ids.shape[1]
    np.testing.assert_array_equal(
        np.asarray(short.ids), np.asarray(long.ids[:, :L])
    )
    assert np.all(np.asarray(long.ids[:, L:]) == PAD_ID)
    np.testing.assert_allclose(
        np.asarray(short.scores), np.asarray(long.scores), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(short.lengths), np.asarray(long.lengths)
    )


def test_greedy_early_exit_when_all_finish():
    params, mem, B = build()
    params = dict(params)
    params["out_b"] = params["out_b"].at[EOS_ID].set(50.0)
    ids_s, len_s = greedy_decode(params, CFG, [mem], MAXLEN + 2,
                                 compute_dtype=jnp.float32)
    ids_l, len_l = greedy_decode(params, CFG, [mem], MAXLEN + 20,
                                 compute_dtype=jnp.float32)
    L = ids_s.shape[1]
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_l[:, :L]))
    assert np.all(np.asarray(ids_l[:, L:]) == PAD_ID)
    np.testing.assert_array_equal(np.asarray(len_s), np.asarray(len_l))


def test_beam_equals_exhaustive_with_value_projection():
    """The exhaustive-equivalence guarantee must survive memory_value_dim
    (the flagship's value down-projection): beam over a projected memory
    still finds the true best finished sequence."""
    import dataclasses

    cfg = dataclasses.replace(CFG, memory_value_dim=3)
    params, mem, B = build(rng_seed=5, cfg=cfg)
    assert mem.values.shape[-1] == 3
    res = beam_search(
        params, cfg, [mem], MAXLEN, beam_width=16, length_penalty=0.0,
        compute_dtype=jnp.float32,
    )
    for b in range(B):
        best_seq, best_score = exhaustive_best(params, mem, b, cfg=cfg)
        got = [int(t) for t in np.asarray(res.ids)[b] if t != PAD_ID]
        assert got == best_seq, (b, got, best_seq)
        np.testing.assert_allclose(
            float(res.scores[b]), best_score, rtol=1e-5, atol=1e-5
        )


def test_nbest_matches_exhaustive_ranking():
    """n_best returns the exhaustive top-N finished sequences in score
    order, and rank 0 equals the top-1 fields."""
    params, mem, B = build()
    N = 4
    res = beam_search(
        params, CFG, [mem], MAXLEN, beam_width=16, length_penalty=0.0,
        compute_dtype=jnp.float32, n_best=N,
    )
    assert res.nbest_ids.shape[1] == N
    np.testing.assert_array_equal(
        np.asarray(res.nbest_ids[:, 0]), np.asarray(res.ids)
    )
    np.testing.assert_allclose(
        np.asarray(res.nbest_scores[:, 0]), np.asarray(res.scores)
    )
    for b in range(B):
        # exhaustive ranking over all FINISHED candidates
        cands = []
        for L in range(1, MAXLEN + 1):
            for body in itertools.product([3, 4], repeat=L - 1):
                seq = list(body) + [EOS_ID]
                cands.append((score_sequence(params, mem, b, seq), seq))
        cands.sort(key=lambda x: -x[0])
        for r in range(N):
            got = [int(x) for x in np.asarray(res.nbest_ids[b, r])
                   if x != PAD_ID]
            want_score, want_seq = cands[r]
            assert got == want_seq, (
                f"row {b} rank {r}: {got} != exhaustive {want_seq}"
            )
            np.testing.assert_allclose(
                float(res.nbest_scores[b, r]), want_score, rtol=1e-4
            )
        # scores are non-increasing
        s = np.asarray(res.nbest_scores[b])
        assert np.all(np.diff(s) <= 1e-6)
