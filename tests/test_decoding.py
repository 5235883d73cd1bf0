"""Decoding tests: greedy/sample semantics and batched beam search
property-tested against a host-side heap reference (the algorithm of
vae_model/decoder.py:203-320 + utils/top_n.py, reimplemented in numpy)."""

import heapq

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_captioning_tpu.ops.decoding import (
    beam_search, sample_decode, tokens_to_text)

V = 12          # toy vocab
EOS = 2
BOS = 1


def make_step_fn(seed=0, hidden=6):
    """A tiny deterministic 'language model': logits depend on a carried
    state and the input token, via fixed random matrices."""
    rng = np.random.default_rng(seed)
    W_tok = jnp.asarray(rng.normal(0, 1.0, (V, hidden)).astype(np.float32))
    W_out = jnp.asarray(rng.normal(0, 1.5, (hidden, V)).astype(np.float32))
    W_h = jnp.asarray(rng.normal(0, 0.7, (hidden, hidden)).astype(np.float32))

    def step_fn(carry, tokens):
        h = jnp.tanh(carry @ W_h + W_tok[tokens])
        return h, h @ W_out

    return step_fn


def host_beam_search(step_fn, init_carry, beam_size, max_len,
                     len_norm_f=0.7):
    """Reference algorithm: per-image heap beam search (numpy/host),
    mirroring decoder.py:227-299 exactly, using the same step_fn."""
    B = init_carry.shape[0]
    results = []
    for b in range(B):
        carry0 = init_carry[b:b + 1]
        # initial BOS step
        new_c, logits = step_fn(carry0, jnp.asarray([BOS]))
        probs = np.asarray(jax.nn.softmax(logits[0]))
        partial = []   # heap of (score, tiebreak, sentence, logprob, carry)
        complete = []
        cnt = 0
        # expand initial step like the loop does (ref pushes one beam with
        # logprob 0 then expands in the first loop iteration; equivalent:
        # treat step 0 expansion directly)
        order = np.argsort(-probs)[:beam_size]
        for w in order:
            p = probs[w]
            if p < 1e-12:
                continue
            sent = [BOS, int(w)]
            lp = float(np.log(p))
            cnt += 1
            if w == EOS:
                score = lp / len(sent) ** len_norm_f if len_norm_f > 0 else lp
                heapq.heappush(complete, (score, cnt, sent, lp, None))
                if len(complete) > beam_size:
                    heapq.heappop(complete)
            else:
                heapq.heappush(partial, (lp, cnt, sent, lp,
                                         np.asarray(new_c)))
                if len(partial) > beam_size:
                    heapq.heappop(partial)
        for _ in range(max_len - 1):
            if not partial:
                break
            beams = sorted(partial, key=lambda x: -x[0])
            partial = []
            for _, _, sent, lp, carry in beams:
                nc, logits = step_fn(jnp.asarray(carry),
                                     jnp.asarray([sent[-1]]))
                probs = np.asarray(jax.nn.softmax(logits[0]))
                order = np.argsort(-probs)[:beam_size]
                for w in order:
                    p = probs[w]
                    if p < 1e-12:
                        continue
                    nsent = sent + [int(w)]
                    nlp = lp + float(np.log(p))
                    cnt += 1
                    if w == EOS:
                        score = (nlp / len(nsent) ** len_norm_f
                                 if len_norm_f > 0 else nlp)
                        heapq.heappush(complete, (score, cnt, nsent, nlp, None))
                        if len(complete) > beam_size:
                            heapq.heappop(complete)
                    else:
                        heapq.heappush(partial, (nlp, cnt, nsent, nlp,
                                                 np.asarray(nc)))
                        if len(partial) > beam_size:
                            heapq.heappop(partial)
        pool = complete if complete else partial
        best = max(pool, key=lambda x: x[0])
        results.append((best[2], best[0]))
    return results


# ---------------------------------------------------------------- greedy

def test_greedy_decode_deterministic():
    step_fn = make_step_fn()
    init = jnp.zeros((3, 6))
    out = sample_decode(step_fn, init, 3, bos_id=BOS, eos_id=EOS, max_len=10)
    out2 = sample_decode(step_fn, init, 3, bos_id=BOS, eos_id=EOS, max_len=10)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert out.shape == (3, 10)


def test_greedy_matches_manual_argmax():
    step_fn = make_step_fn(seed=3)
    init = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6))
                       .astype(np.float32))
    out = np.asarray(sample_decode(step_fn, init, 2, bos_id=BOS, eos_id=EOS,
                                   max_len=6))
    # manual unroll
    carry, tok = init, jnp.asarray([BOS, BOS])
    for t in range(6):
        carry, logits = step_fn(carry, tok)
        nxt = np.asarray(jnp.argmax(logits, -1))
        for b in range(2):
            if t == 0 or (out[b, :t] != EOS).all() and (out[b, :t] != 0).all():
                assert out[b, t] == nxt[b]
        tok = jnp.asarray(nxt)


def test_greedy_stops_at_eos():
    """After EOS is emitted the remaining positions must be PAD."""
    step_fn = make_step_fn(seed=1)
    out = np.asarray(sample_decode(step_fn, jnp.zeros((8, 6)), 8,
                                   bos_id=BOS, eos_id=EOS, max_len=20))
    for row in out:
        hits = np.where(row == EOS)[0]
        if len(hits):
            assert (row[hits[0] + 1:] == 0).all()


def test_sample_decode_rng():
    step_fn = make_step_fn(seed=2)
    init = jnp.zeros((4, 6))
    kw = dict(bos_id=BOS, eos_id=EOS, max_len=10, mode="sample",
              temperature=1.0)
    a = sample_decode(step_fn, init, 4, rng=jax.random.PRNGKey(0), **kw)
    b = sample_decode(step_fn, init, 4, rng=jax.random.PRNGKey(0), **kw)
    c = sample_decode(step_fn, init, 4, rng=jax.random.PRNGKey(9), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_sample_requires_rng():
    with pytest.raises(ValueError):
        sample_decode(make_step_fn(), jnp.zeros((1, 6)), 1, bos_id=BOS,
                      eos_id=EOS, max_len=4, mode="sample")


# ---------------------------------------------------------------- beam

@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("beam_size", [2, 3])
def test_beam_matches_host_reference(seed, beam_size):
    step_fn = make_step_fn(seed=seed)
    rng = np.random.default_rng(seed + 100)
    B = 3
    init = jnp.asarray(rng.normal(0, 1, (B, 6)).astype(np.float32))
    res = beam_search(step_fn, init, B, beam_size=beam_size, bos_id=BOS,
                      eos_id=EOS, max_len=8)
    host = host_beam_search(step_fn, init, beam_size, max_len=8)
    for b in range(B):
        want_sent, want_score = host[b]
        got = [int(x) for x in np.asarray(res.tokens[b, 0])]
        # our tokens exclude BOS; truncate at EOS inclusive (token 0 is a
        # real word in the toy vocab, so only EOS truncates)
        if EOS in got:
            got = got[: got.index(EOS) + 1]
        assert got == want_sent[1:], f"image {b}: {got} vs {want_sent[1:]}"
        assert float(res.scores[b, 0]) == pytest.approx(want_score, rel=1e-4)


def test_beam_scores_sorted_and_distinct():
    step_fn = make_step_fn(seed=7)
    res = beam_search(step_fn, jnp.zeros((2, 6)), 2, beam_size=4,
                      bos_id=BOS, eos_id=EOS, max_len=8)
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # descending
    # top beams should be distinct sequences
    assert not np.array_equal(np.asarray(res.tokens[0, 0]),
                              np.asarray(res.tokens[0, 1]))


def test_beam_batch_independence():
    """Each image's result must not depend on its batch neighbors."""
    step_fn = make_step_fn(seed=5)
    rng = np.random.default_rng(0)
    init = jnp.asarray(rng.normal(0, 1, (4, 6)).astype(np.float32))
    full = beam_search(step_fn, init, 4, beam_size=3, bos_id=BOS,
                       eos_id=EOS, max_len=8)
    solo = beam_search(step_fn, init[2:3], 1, beam_size=3, bos_id=BOS,
                       eos_id=EOS, max_len=8)
    np.testing.assert_array_equal(np.asarray(full.tokens[2]),
                                  np.asarray(solo.tokens[0]))


def test_beam_jit_compatible():
    step_fn = make_step_fn(seed=6)

    @jax.jit
    def run(init):
        return beam_search(step_fn, init, 2, beam_size=3, bos_id=BOS,
                           eos_id=EOS, max_len=8)

    res = run(jnp.zeros((2, 6)))
    res2 = beam_search(step_fn, jnp.zeros((2, 6)), 2, beam_size=3,
                       bos_id=BOS, eos_id=EOS, max_len=8)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(res2.tokens))


def test_tokens_to_text():
    idx2word = {0: "<PAD>", 1: "<BOS>", 2: "<EOS>", 3: "a", 4: "dog"}
    assert tokens_to_text([3, 4, 2, 3, 3], idx2word, 2) == "a dog"
    assert tokens_to_text([3, 4, 0, 0], idx2word, 2) == "a dog"


def test_early_exit_identical_results():
    """Bound-based early termination must not change any output, even
    when EOS dominates early (where the exit actually fires)."""
    rng = np.random.default_rng(11)
    W_tok = jnp.asarray(rng.normal(0, 1.0, (V, 6)).astype(np.float32))
    W_out = np.asarray(rng.normal(0, 1.5, (6, V)), np.float32)
    W_out[:, EOS] += 3.0  # strong EOS pull → beams finish fast
    W_out = jnp.asarray(W_out)
    W_h = jnp.asarray(rng.normal(0, 0.7, (6, 6)).astype(np.float32))

    def step_fn(carry, tokens):
        h = jnp.tanh(carry @ W_h + W_tok[tokens])
        return h, h @ W_out

    init = jnp.asarray(rng.normal(0, 1, (4, 6)).astype(np.float32))
    kw = dict(beam_size=3, bos_id=BOS, eos_id=EOS, max_len=20)
    a = beam_search(step_fn, init, 4, early_exit=True, **kw)
    b = beam_search(step_fn, init, 4, early_exit=False, **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=1e-5)


def test_tokens_to_text_filters_bos():
    idx2word = {0: "<PAD>", 1: "<BOS>", 2: "<EOS>", 3: "a", 4: "dog",
                5: "<UNK>"}
    # sampled sequences can contain BOS mid-stream (ref filters it) and
    # UNK (ref keeps it)
    assert tokens_to_text([3, 1, 4, 5, 2], idx2word, 2, bos_id=1) == \
        "a dog <UNK>"


def test_floored_eos_never_finishes():
    """Regression (review finding): an EOS whose prob was floored by the
    p<1e-12 skip must NOT enter the finished pool — the reference falls
    back to the best partial caption instead."""
    # peaked LM: token 3 has ~all mass; EOS prob < 1e-12 but still in
    # the per-beam top-K of a 4-token vocab
    logits_row = np.full(V, -40.0, np.float32)
    logits_row[3] = 40.0
    logits_row[EOS] = 0.0  # p(EOS) ~ e^-40 < 1e-12

    def step_fn(carry, tokens):
        return carry, jnp.broadcast_to(jnp.asarray(logits_row),
                                       (tokens.shape[0], V))

    init = jnp.zeros((2, 4))
    res = beam_search(step_fn, init, 2, beam_size=2, bos_id=BOS, eos_id=EOS,
                      max_len=8)
    # fallback-to-partials: best beam is all 3s with raw-logprob score ~0
    assert (np.asarray(res.tokens[:, 0]) == 3).all(), np.asarray(res.tokens)
    assert float(res.scores[0, 0]) > -1.0  # NOT a NEG_INF-derived score


def test_sample_decode_early_exit_identical():
    """early_exit must not change greedy or sampled outputs — dead lanes
    emit PAD either way; the while_loop just stops paying for them."""
    step_fn = make_step_fn()
    init = jnp.zeros((4, 6))
    kw = dict(bos_id=BOS, eos_id=EOS, max_len=12)
    a = sample_decode(step_fn, init, 4, early_exit=True, **kw)
    b = sample_decode(step_fn, init, 4, early_exit=False, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rng = jax.random.PRNGKey(5)
    c = sample_decode(step_fn, init, 4, mode="sample", rng=rng,
                      early_exit=True, **kw)
    d = sample_decode(step_fn, init, 4, mode="sample", rng=rng,
                      early_exit=False, **kw)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


@pytest.mark.parametrize("beam_size,max_len,B", [
    (1, 8, 3),    # single-beam: backpointers are all zeros
    (3, 1, 3),    # one expansion step only
    (2, 8, 1),    # single image
    (4, 3, 2),    # beam > candidates surviving a short run
])
def test_beam_edge_shapes_match_host(beam_size, max_len, B):
    """Backpointer beam search must agree with the host oracle at the
    degenerate shapes (K=1, T=1, B=1) where reconstruction and the
    finished-pool bookkeeping are most fragile."""
    step_fn = make_step_fn(seed=11)
    rng = np.random.default_rng(17)
    init = jnp.asarray(rng.normal(0, 1, (B, 6)).astype(np.float32))
    res = beam_search(step_fn, init, B, beam_size=beam_size, bos_id=BOS,
                      eos_id=EOS, max_len=max_len)
    host = host_beam_search(step_fn, init, beam_size, max_len=max_len)
    assert res.tokens.shape == (B, beam_size, max_len)
    for b in range(B):
        want_sent, want_score = host[b]
        got = [int(x) for x in np.asarray(res.tokens[b, 0])]
        if EOS in got:
            got = got[: got.index(EOS) + 1]
        assert got == want_sent[1:], f"image {b}: {got} vs {want_sent[1:]}"
        assert float(res.scores[b, 0]) == pytest.approx(want_score, rel=1e-4)
