"""Batch caption generation + COCO-eval JSON export.

Replaces ``ops/inference.py`` and the decode halves of
``vae_model/decoder.py``: restores a checkpoint, sweeps the val split
with beam search or greedy/sampled decode, the test split with greedy
(ref ``ops/inference.py:41-56``), and writes ``val_<gen_name>.json`` /
``test_<gen_name>.json`` in the tylin/coco-caption format
(``[{"image_id": int, "caption": str}]``).

The decode itself is one jit per (batch, beam, length) shape: features →
z-draw → init state → scanned beam search — no host round-trips.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_captioning_tpu.config import Config
from vae_captioning_tpu.data.vocabulary import Vocabulary
from vae_captioning_tpu.models.cvae import (CVAEModel, decoder_step_params,
                                            logits_head_params)
from vae_captioning_tpu.ops.decoding import (
    beam_search, sample_decode, tokens_to_text)


def make_decode_fns(model, cfg: Config, vocab: Vocabulary):
    """Jitted whole-batch decoders: (params, features_or_images, c_v, rng)
    → tokens.  Works for CVAEModel (features input) and FineTuneModel
    (raw images input) alike — both expose decode_init/decode_step."""
    bos, eos = vocab.bos_id, vocab.eos_id
    needs_cv = cfg.needs_cluster_vectors
    cls = type(model)
    # compiled Pallas path only; cfg.fused_decode=False is the pure-XLA
    # kill switch (results are identical either way — tested).
    # fused_force bypasses the backend gate for interpret-mode tests,
    # same stance as the train path (config.py fused_force)
    fused = cfg.fused_decode and (jax.default_backend() == "tpu"
                                  or cfg.fused_force)
    # second-level kill switch: LSTM step (embedding gather + gate matmul
    # + elementwise) as ONE Pallas kernel (ops/fused_lstm_step.py); only
    # for the single-layer bf16 decoder (the reference default)
    fused_step = (fused and cfg.fused_lstm_step
                  and cfg.decoder_rnn_layers == 1
                  and jnp.dtype(cfg.compute_dtype) == jnp.bfloat16)

    def _hidden_step_fn(params):
        """(carry, tokens) → (carry, hidden [N, H]): the LSTM half of a
        decode step, fused when eligible."""
        if not fused_step:
            def fn(carry, tokens):
                return model.apply({"params": params}, carry, tokens,
                                   method=cls.decode_step_hidden)
            return fn
        # dp shard_map wrapper: lanes split over a >1-device mesh,
        # single-device passthrough otherwise (parallel/kernel_shard.py)
        from vae_captioning_tpu.parallel.kernel_shard import lstm_step
        emb, kern, kbias = decoder_step_params(params)

        def fn(carry, tokens):
            ((c, h),) = carry
            nc, nh = lstm_step(tokens, c, h, emb, kern, kbias)
            return ((nc, nh),), nh

        return fn

    def _init_and_step(params, features, c_v, rng):
        c_v = c_v if needs_cv else None
        carry = model.apply({"params": params}, features, c_v,
                            rngs={"z": rng}, method=cls.decode_init)

        def step_fn(carry, tokens):
            return model.apply({"params": params}, carry, tokens,
                               method=cls.decode_step)

        return carry, step_fn

    def _topk_caller(params, k):
        """(h) → (vals, idx, lse) over the logits head; int8-quantized
        when Config.decode_int8 (approximate — documented there)."""
        w, b = logits_head_params(params)
        from vae_captioning_tpu.parallel import kernel_shard
        if cfg.decode_int8:
            from vae_captioning_tpu.ops.fused_logits_topk import (
                quantize_logits_weights)
            wq, ws = quantize_logits_weights(w)
            return lambda h: kernel_shard.logits_top_k_int8(h, wq, ws, b, k)
        return lambda h: kernel_shard.logits_top_k(h, w, b, k)

    def _step_topk_fn(params, k):
        """Fused decode step: LSTM → one Pallas kernel for
        logits+top-K+logsumexp (no [N, V] logits in HBM)."""
        topk = _topk_caller(params, k)
        hidden_step = _hidden_step_fn(params)

        def fn(carry, tokens):
            carry, h = hidden_step(carry, tokens)
            vals, idx, lse = topk(h)
            return carry, vals, idx, lse

        return fn

    @jax.jit
    def beam_fn(params, features, c_v, rng):
        carry, step_fn = _init_and_step(params, features, c_v, rng)
        result = beam_search(
            step_fn, carry, features.shape[0],
            beam_size=cfg.beam_size, bos_id=bos, eos_id=eos,
            max_len=cfg.gen_max_len, len_norm_f=cfg.len_norm_f,
            use_pallas=None if fused else False,
            step_topk_fn=_step_topk_fn(params, cfg.beam_size) if fused
            else None)
        return result.tokens[:, 0], result.scores[:, 0]

    @jax.jit
    def beam_all_fn(params, features, c_v, rng):
        """All beams, best-first (ref ret_beams, decoder.py:311-319)."""
        carry, step_fn = _init_and_step(params, features, c_v, rng)
        result = beam_search(
            step_fn, carry, features.shape[0],
            beam_size=cfg.beam_size, bos_id=bos, eos_id=eos,
            max_len=cfg.gen_max_len, len_norm_f=cfg.len_norm_f,
            use_pallas=None if fused else False,
            step_topk_fn=_step_topk_fn(params, cfg.beam_size) if fused
            else None)
        return result.tokens, result.scores

    def _step_argmax_fn(params):
        """Greedy fast path: argmax = fused top-1, logits never in HBM."""
        topk = _topk_caller(params, 1)
        hidden_step = _hidden_step_fn(params)

        def fn(carry, tokens):
            carry, h = hidden_step(carry, tokens)
            _, idx, _ = topk(h)
            return carry, idx[:, 0]

        return fn

    @jax.jit
    def greedy_fn(params, features, c_v, rng):
        carry, step_fn = _init_and_step(params, features, c_v, rng)
        return sample_decode(step_fn, carry, features.shape[0], bos_id=bos,
                             eos_id=eos, max_len=cfg.gen_max_len,
                             step_argmax_fn=_step_argmax_fn(params) if fused
                             else None)

    def _step_sample_fn(params):
        """Temperature sampling fast path: Gumbel-max fused with the
        logits matmul (one categorical draw per row, no [N, V] in HBM)."""
        from vae_captioning_tpu.parallel.kernel_shard import logits_sample
        w, b = logits_head_params(params)
        hidden_step = _hidden_step_fn(params)

        def fn(carry, tokens, step_rng):
            carry, h = hidden_step(carry, tokens)
            seed = jax.random.randint(step_rng, (), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            nxt = logits_sample(h, w, b, seed, cfg.temperature)
            return carry, nxt

        return fn

    @jax.jit
    def sample_fn(params, features, c_v, rng):
        carry, step_fn = _init_and_step(params, features, c_v, rng)
        return sample_decode(step_fn, carry, features.shape[0], bos_id=bos,
                             eos_id=eos, max_len=cfg.gen_max_len,
                             mode="sample", temperature=cfg.temperature,
                             rng=jax.random.fold_in(rng, 1),
                             step_sample_fn=_step_sample_fn(params) if fused
                             else None)

    return {"beam_search": beam_fn, "beam_search_all": beam_all_fn,
            "greedy": greedy_fn, "sample": sample_fn}


def generate_captions(
    params,
    batcher,
    decode_fn: Callable,
    vocab: Vocabulary,
    rng: jax.Array,
    image_batches: bool = False,
    stats: Optional[Dict[str, int]] = None,
) -> List[Dict]:
    """Sweep a batcher, decode every image, return coco-eval dicts.

    Pipelined: batch t+1's decode is dispatched (async) before batch t's
    tokens are fetched and detokenized, so host-side text assembly
    overlaps device decode — no host gap on a 40k-image sweep
    (VERDICT r1 #7).

    ``stats``, when given, receives ``{"cv_fallbacks": N}`` aggregated
    from the consumed batches — exact per-sweep attribution even when
    batches come off a prefetch thread (ADVICE r3)."""
    out: List[Dict] = []
    cv_fallbacks = 0
    idx2word, eos, bos = vocab.idx2word, vocab.eos_id, vocab.bos_id
    iterator = (batcher.image_batches() if image_batches
                else batcher.eval_batches(with_ids=True))

    def drain(res, batch):
        tokens = np.asarray(res[0] if isinstance(res, tuple) else res)
        for row in range(batch.valid):
            out.append({
                "image_id": int(batch.image_ids[row]),
                "caption": tokens_to_text(tokens[row], idx2word, eos, bos),
            })

    pending = None
    for i, batch in enumerate(iterator):
        cv_fallbacks += getattr(batch, "cv_fallbacks", 0)
        res = decode_fn(params, jnp.asarray(batch.features),
                        jnp.asarray(batch.cluster_vectors),
                        jax.random.fold_in(rng, i))
        if pending is not None:
            drain(*pending)
        pending = (res, batch)
    if pending is not None:
        drain(*pending)
    if stats is not None:
        stats["cv_fallbacks"] = cv_fallbacks
    return out


def make_quality_hook(cfg: Config, vocab: Vocabulary,
                      references: Dict[str, List[str]]):
    """Per-epoch caption-quality hook for ``Trainer.fit``
    (``Config.eval_metrics``): greedy-decode the holdout batcher, score
    with the in-repo BLEU/CIDEr-D (validated in tests/test_eval.py), and
    return a metrics dict for the JSONL log.  Greedy, not beam: the hook
    runs every epoch and is a trend signal, not the final number —
    ``examples/reference_recipe.sh`` does the beam-10 measurement."""
    from vae_captioning_tpu.eval.meteor import corpus_meteor_es
    from vae_captioning_tpu.eval.scorers import cider_d, corpus_bleu, rouge_l
    from vae_captioning_tpu.train import build_model

    model = build_model(cfg)
    greedy = make_decode_fns(model, cfg, vocab)["greedy"]

    def hook(params, val_batcher, rng) -> Dict[str, float]:
        caps = generate_captions(params, val_batcher, greedy, vocab, rng)
        hyps = {str(c["image_id"]): c["caption"] for c in caps
                if str(c["image_id"]) in references and c["caption"]}
        if not hyps:
            return {"val_CIDEr-D": 0.0, "val_BLEU-4": 0.0,
                    "val_ROUGE-L": 0.0, "val_METEOR_es": 0.0}
        refs = {iid: references[iid] for iid in hyps}
        bleu = corpus_bleu(hyps, refs)
        keys = sorted(hyps)
        meteor = corpus_meteor_es(
            [hyps[k].split() for k in keys],
            [[r.split() for r in refs[k]] for k in keys])
        return {"val_CIDEr-D": round(cider_d(hyps, refs), 4),
                "val_BLEU-4": round(bleu[3], 4),
                "val_ROUGE-L": round(rouge_l(hyps, refs), 4),
                "val_METEOR_es": round(meteor, 4)}

    return hook


def run_inference(
    cfg: Config,
    params,
    vocab: Vocabulary,
    val_batcher,
    test_batcher=None,
    output_dir: str = ".",
) -> Dict[str, str]:
    """Full inference pass (ref ops/inference.py:4-56)."""
    from vae_captioning_tpu.train import build_model
    model = build_model(cfg)
    fns = make_decode_fns(model, cfg, vocab)
    rng = jax.random.PRNGKey(cfg.seed)
    written: Dict[str, str] = {}

    def _report_cv_fallbacks(split: str, n_caps: int, stats: Dict) -> None:
        # a zero cluster vector silently degrades c_v-conditioned
        # quality (VERDICT r2 #7) — surface the count per split; the
        # count rides each Batch, so prefetch threads can't misattribute
        # it (ADVICE r3)
        if cfg.needs_cluster_vectors and stats.get("cv_fallbacks"):
            print(f"WARNING: {stats['cv_fallbacks']}/{n_caps} {split} "
                  "images had no cluster vector (served the zero "
                  "fallback); c_v-conditioned caption quality degrades "
                  "for these. See data/cluster_vectors.py --help to "
                  "build vectors from detector output.")

    print("Generating captions for val file")
    val_fn = fns[cfg.sample_gen]
    stats: Dict[str, int] = {}
    caps = generate_captions(params, val_batcher, val_fn, vocab, rng,
                             stats=stats)
    val_path = os.path.join(output_dir, f"val_{cfg.gen_name}.json")
    with open(val_path, "w") as f:
        json.dump(caps, f)
    print(f"Generated {len(caps)} captions → {val_path}")
    _report_cv_fallbacks("val", len(caps), stats)
    written["val"] = val_path

    if test_batcher is not None:
        print("Generating captions for test file")
        stats = {}
        caps = generate_captions(params, test_batcher, fns["greedy"], vocab,
                                 jax.random.fold_in(rng, 999),
                                 image_batches=True, stats=stats)
        test_path = os.path.join(output_dir, f"test_{cfg.gen_name}.json")
        with open(test_path, "w") as f:
            json.dump(caps, f)
        print(f"Generated {len(caps)} captions → {test_path}")
        _report_cv_fallbacks("test", len(caps), stats)
        written["test"] = test_path
    return written
