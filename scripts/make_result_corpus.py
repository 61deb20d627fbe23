"""Generate the checked-in structured result corpus (VERDICT r2 #4):
tiny deterministic models quantized across the flag matrix, evaluated on
the seeded synthetic stream, appended as protocol-tagged result lines —
the offline mirror of the reference's quant_bit/*_ppl.txt discipline
(reference: opt.py:335-357) plus a recorded per-module sensitivity log
(reference: sensitivity/*.txt). Deterministic end to end (seeded params,
seeded data), so the files double as regression baselines:
tests/test_result_corpus.py re-runs one row and matches it.

Round 4 (VERDICT r3 #7) adds a DEEPER-trained model (tiny-llama-deep:
4 layers, hidden 128 — its PPL separates quant configs much
more sharply than the 2-layer tinies) and a zero-shot task-score corpus
(zeroshot.txt): the real 13-task harness (eval/zeroshot) scored offline
on a synthetic continuation-choice PiQA whose correct answer is the
stream's true next tokens — the trained model beats chance decisively,
so the accuracy row anchors the whole request-construction / batched
loglikelihood / metric pipeline, not just PPL.

Run: /opt/venv/bin/python scripts/make_result_corpus.py
Writes: results/tiny_corpus/{ppl.txt,zeroshot.txt,
        sensitivity-tiny-llama-4bit.txt}
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import copy  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT_DIR = "results/tiny_corpus"

# the flag matrix, mirroring the reference recipes (script/eval_opt.sh):
# (tag, QuantConfig overrides)
CONFIGS = [
    ("fp16", dict(wbits=16)),
    ("w4", dict(wbits=4)),
    ("w3", dict(wbits=3)),
    ("w2", dict(wbits=2)),
    ("w4-g32", dict(wbits=4, groupsize=32)),
    ("w3-g32-actorder", dict(wbits=3, groupsize=32, act_order=True,
                             static_groups=True)),
    ("w4-rtn", dict(wbits=4, nearest=True)),
    ("w3-columnwise-apot2", dict(wbits=3, columnwise=True, apot_nums=2)),
    ("w3-lut-bcq", dict(wbits=3, lut_eval=True, bcq_round=2)),
    ("w4-nonlinear-h5", dict(wbits=4, non_linear=True, hyperbits=5)),
    ("w3-trits", dict(wbits=2, trits=True)),
]


def corpus_models():
    from gptq_tpu.models.common import ArchSpec

    tiny_opt = ArchSpec(arch="opt", n_layers=2, hidden=64, n_heads=4,
                        n_kv_heads=4, ffn=128, vocab=256, max_pos=128,
                        act="relu", pos="learned", norm_type="layernorm",
                        linear_bias=True, tie_embeddings=True)
    tiny_llama = ArchSpec(arch="llama", n_layers=2, hidden=64, n_heads=4,
                          n_kv_heads=2, ffn=128, vocab=256, max_pos=128,
                          act="silu", pos="rope", norm_type="rmsnorm",
                          linear_bias=False, tie_embeddings=False)
    tiny_bloom = ArchSpec(arch="bloom", n_layers=2, hidden=64, n_heads=4,
                          n_kv_heads=4, ffn=128, vocab=256, max_pos=128,
                          act="gelu_tanh", pos="alibi",
                          norm_type="layernorm", linear_bias=True,
                          tie_embeddings=True)
    return [("tiny-opt", tiny_opt), ("tiny-llama", tiny_llama),
            ("tiny-bloom", tiny_bloom)]


def deep_model():
    """The deeper-trained anchor (VERDICT r3 #7): 4 layers x hidden 128 —
    its PPL gap between configs is wide enough that a real quality
    regression in any quant path moves its rows far outside tolerance
    (the 2-layer tinies sit closer to uniform)."""
    from gptq_tpu.models.common import ArchSpec

    return ("tiny-llama-deep",
            ArchSpec(arch="llama", n_layers=4, hidden=128, n_heads=8,
                     n_kv_heads=4, ffn=256, vocab=256, max_pos=128,
                     act="silu", pos="rope", norm_type="rmsnorm",
                     linear_bias=False, tie_embeddings=False))


DEEP_CONFIGS = [
    ("fp16", dict(wbits=16)),
    ("w4", dict(wbits=4)),
    ("w3-g32-actorder", dict(wbits=3, groupsize=32, act_order=True,
                             static_groups=True)),
    ("w4-rtn", dict(wbits=4, nearest=True)),
]

# the DISCRIMINATIVE anchor (VERDICT r4 #5): same architecture trained on
# the sparse order-1 Markov stream (data.markov_stream) whose held-out
# PPL floor is the chain's conditional entropy — far below uniform, so
# any weight perturbation strictly hurts and the bit ordering
# fp16 < w4 < w3 < w2 (and GPTQ < RTN at matched bits) emerges cleanly;
# tests/test_result_corpus.py ASSERTS those orderings
MARKOV_CONFIGS = [
    ("fp16", dict(wbits=16)),
    ("w4", dict(wbits=4)),
    ("w3", dict(wbits=3)),
    ("w2", dict(wbits=2)),
    ("w4-rtn", dict(wbits=4, nearest=True)),
    ("w3-rtn", dict(wbits=3, nearest=True)),
    ("w3-g32-actorder", dict(wbits=3, groupsize=32, act_order=True,
                             static_groups=True)),
]


def markov_opt_model():
    """Second Markov anchor arch (learned-pos layernorm opt family).
    BLOOM was prototyped and excluded: the alibi model is so robust at
    this scale that all quant deltas sit below run noise (w3-rtn beat
    w3 by 0.008 PPL, g32-actorder beat fp16) — asserting order there
    would pin noise, not quality. The opt anchor orders strictly on
    bits and GPTQ-vs-RTN; only its act-order row is within noise."""
    from gptq_tpu.models.common import ArchSpec

    return ("tiny-opt-markov",
            ArchSpec(arch="opt", n_layers=4, hidden=128, n_heads=8,
                     n_kv_heads=8, ffn=256, vocab=256, max_pos=128,
                     act="relu", pos="learned", norm_type="layernorm",
                     linear_bias=True, tie_embeddings=True))


def markov_trained_base(spec, steps: int = 600):
    """Train the deep spec on the Markov stream. More unique data per
    step than trained_base (the stream is cheap and overfitting would
    re-blur the ordering the anchor exists to sharpen)."""
    from gptq_tpu.data import markov_stream
    from gptq_tpu.finetune import make_optimizer, make_train_step
    from gptq_tpu.models.common import init_params

    params = init_params(spec, jax.random.PRNGKey(0))
    opt = make_optimizer("adamw", lr=5e-4)
    init, step = make_train_step(spec, opt)
    st = init(params)
    T = spec.max_pos
    data = markov_stream(spec.vocab, 8 * T * steps // 8 + 8 * T, seed=21,
                         seq_seed=100)
    for i in range(steps):
        off = (i * 8 * T) % (len(data) - 8 * T)
        batch = jnp.asarray(data[off:off + 8 * T].reshape(8, T))
        params, st, _ = step(params, st, batch)
    return params


class StableWordTokenizer:
    """Deterministic word tokenizer for the offline zero-shot corpus:
    numeric words ARE token ids (so synthetic-stream contexts hit the
    model's training distribution exactly); other words hash via crc32
    (process-stable, unlike Python's salted hash). eos=0."""

    eos_token_id = 0

    def __init__(self, vocab: int):
        self.vocab = vocab

    def __call__(self, s):
        import zlib

        class Enc:
            pass

        e = Enc()
        e.input_ids = [
            int(w) % self.vocab if w.isdigit()
            else 1 + (zlib.crc32(w.encode()) % (self.vocab - 1))
            for w in s.split()
        ]
        return e


def zeroshot_docs(vocab: int, n_docs: int = 64, ctx_len: int = 16,
                  cont_len: int = 8):
    """Synthetic continuation-choice docs in PiQA format: goal = a stream
    window, sol1 = its TRUE next tokens, sol2 = random tokens. A trained
    model assigns sol1 higher likelihood, so accuracy lands well above
    chance — a real signal, robust to float jitter."""
    from gptq_tpu.data import synthetic_stream

    data = synthetic_stream(vocab, n_docs * (ctx_len + cont_len) + 64,
                            seed=11)
    rng = np.random.default_rng(13)
    docs = []
    for i in range(n_docs):
        off = i * (ctx_len + cont_len)
        ctx = data[off:off + ctx_len]
        true = data[off + ctx_len:off + ctx_len + cont_len]
        rand = rng.integers(1, vocab, size=cont_len)
        docs.append({"goal": " ".join(map(str, ctx)),
                     "sol1": " " + " ".join(map(str, true)),
                     "sol2": " " + " ".join(map(str, rand)),
                     "label": 0})
    return docs


def zeroshot_rows(spec, trained_params, quantize_fn, log=print):
    """Score fp16 + w4 through the REAL harness (PiQA task class, JaxLM,
    evaluate) on the synthetic docs; returns result lines."""
    import copy

    from gptq_tpu.eval.zeroshot import JaxLM, evaluate
    from gptq_tpu.eval.zeroshot.tasks import PiQA

    docs = zeroshot_docs(spec.vocab)
    task = PiQA(dataset={"train": docs, "validation": docs})
    lines = []
    for tag, quant in (("fp16", False), ("w4", True)):
        params = copy.deepcopy(trained_params)
        if quant:
            quantize_fn(params)
        lm = JaxLM(spec, params, StableWordTokenizer(spec.vocab),
                   max_length=spec.max_pos, batch_size=8)
        res = evaluate(lm, {"piqa-synthetic": task})["results"][
            "piqa-synthetic"]
        line = (f"model = tiny-llama-deep, task = piqa-synthetic, "
                f"config = {tag}, protocol = zeroshot   :   "
                f"acc = {res['acc']:.4f}, acc_norm = {res['acc_norm']:.4f}")
        log(line)
        lines.append(line)
    return lines


def trained_base(spec, steps: int = 700):
    """Deterministically train the tiny model on the synthetic stream
    so its PPL is far below uniform — random-init weights quantize to
    indistinguishable near-uniform PPLs, which carries no regression
    signal; a trained model's PPL separates the quant configs."""
    from gptq_tpu.data import synthetic_stream
    from gptq_tpu.finetune import make_optimizer, make_train_step
    from gptq_tpu.models.common import init_params

    params = init_params(spec, jax.random.PRNGKey(0))
    opt = make_optimizer("adamw", lr=5e-4)
    init, step = make_train_step(spec, opt)
    st = init(params)
    T = spec.max_pos
    data = synthetic_stream(spec.vocab, 8 * T * steps // 64 + 8 * T,
                            seed=7)
    for i in range(steps):
        off = (i * 8 * T) % (len(data) - 8 * T)
        batch = jnp.asarray(data[off:off + 8 * T].reshape(8, T))
        params, st, loss = step(params, st, batch)
    return params


def main() -> int:
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.data import synthetic_stream
    from gptq_tpu.eval.ppl import eval_ppl
    from gptq_tpu.pipeline import quantize_model

    os.makedirs(OUT_DIR, exist_ok=True)
    ppl_path = os.path.join(OUT_DIR, "ppl.txt")
    lines = []
    for mname, spec in corpus_models():
        base = trained_base(spec)
        T = spec.max_pos
        calib = jnp.asarray(
            synthetic_stream(spec.vocab, 4 * T, seed=1).reshape(4, T))
        test = jnp.asarray(
            synthetic_stream(spec.vocab, 8 * T, seed=2).reshape(1, -1))
        for tag, over in CONFIGS:
            params = copy.deepcopy(base)
            cfg = QuantConfig(nsamples=4, seed=0, dataset="synthetic",
                              **over)
            if cfg.wbits < 16 or cfg.trits:
                quantize_model(spec, params, calib, cfg,
                               log=lambda s: None)
            ppl = eval_ppl(spec, params, test, T)
            line = (f"model = {mname}, dataset = synthetic-s2, "
                    f"config = {tag}, wbits = {cfg.wbits}, "
                    f"groupsize = {cfg.groupsize}, lut = {cfg.lut_eval}, "
                    f"nonLinear = {cfg.non_linear}, "
                    f"columnwise = {cfg.columnwise}, protocol = eval"
                    f"   :   {ppl:.4f}")
            print(line)
            lines.append(line)
    # deeper-trained anchor rows (VERDICT r3 #7). 300 steps, not more:
    # the 4-layer model OVERFITS the stream beyond that (test-stream PPL
    # 824 at 700 steps vs 204 at 300, both vs uniform 256) and an overfit
    # base inverts the fp16-vs-quantized ordering the anchor exists to
    # regress
    dname, dspec = deep_model()
    deep_base = trained_base(dspec, steps=300)
    T = dspec.max_pos
    calib = jnp.asarray(
        synthetic_stream(dspec.vocab, 4 * T, seed=1).reshape(4, T))
    test = jnp.asarray(
        synthetic_stream(dspec.vocab, 8 * T, seed=2).reshape(1, -1))
    for tag, over in DEEP_CONFIGS:
        params = copy.deepcopy(deep_base)
        cfg = QuantConfig(nsamples=4, seed=0, dataset="synthetic", **over)
        if cfg.wbits < 16 or cfg.trits:
            quantize_model(dspec, params, calib, cfg, log=lambda s: None)
        ppl = eval_ppl(dspec, params, test, T)
        line = (f"model = {dname}, dataset = synthetic-s2, "
                f"config = {tag}, wbits = {cfg.wbits}, "
                f"groupsize = {cfg.groupsize}, lut = {cfg.lut_eval}, "
                f"nonLinear = {cfg.non_linear}, "
                f"columnwise = {cfg.columnwise}, protocol = eval"
                f"   :   {ppl:.4f}")
        print(line)
        lines.append(line)
    # Markov-stream anchor rows: held-out path (seq_seed=200) from the
    # SAME transition table — the ordering-discriminative corpus
    from gptq_tpu.data import markov_stream

    for mname, mspec in (("tiny-llama-markov", deep_model()[1]),
                         markov_opt_model()):
        mbase = markov_trained_base(mspec)
        T = mspec.max_pos
        mcalib = jnp.asarray(
            markov_stream(mspec.vocab, 4 * T, seed=21, seq_seed=150)
            .reshape(4, T))
        mtest = jnp.asarray(
            markov_stream(mspec.vocab, 8 * T, seed=21, seq_seed=200)
            .reshape(1, -1))
        for tag, over in MARKOV_CONFIGS:
            params = copy.deepcopy(mbase)
            cfg = QuantConfig(nsamples=4, seed=0, dataset="synthetic",
                              **over)
            if cfg.wbits < 16 or cfg.trits:
                quantize_model(mspec, params, mcalib, cfg,
                               log=lambda s: None)
            ppl = eval_ppl(mspec, params, mtest, T)
            line = (f"model = {mname}, dataset = markov-s200, "
                    f"config = {tag}, wbits = {cfg.wbits}, "
                    f"groupsize = {cfg.groupsize}, lut = {cfg.lut_eval}, "
                    f"nonLinear = {cfg.non_linear}, "
                    f"columnwise = {cfg.columnwise}, protocol = eval"
                    f"   :   {ppl:.4f}")
            print(line)
            lines.append(line)
    with open(ppl_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    # zero-shot task-score anchor through the real harness
    def quant_w4(params):
        quantize_model(dspec, params, calib, QuantConfig(
            wbits=4, nsamples=4, seed=0, dataset="synthetic"),
            log=lambda s: None)

    zs_lines = zeroshot_rows(dspec, deep_base, quant_w4)
    with open(os.path.join(OUT_DIR, "zeroshot.txt"), "w") as f:
        f.write("\n".join(zs_lines) + "\n")

    # recorded per-module sensitivity corpus (reference sensitivity/*.txt:
    # "0.self_attn.k_proj: 53833.6...")
    from gptq_tpu.analysis import save_sensitivity_log
    from gptq_tpu.config import QuantConfig as QC

    _, spec = corpus_models()[1]
    params = trained_base(spec)
    calib = jnp.asarray(
        synthetic_stream(spec.vocab, 4 * spec.max_pos, seed=1)
        .reshape(4, spec.max_pos))
    res = quantize_model(spec, params, calib, QC(wbits=4, nsamples=4),
                         log=lambda s: None)
    sens_path = os.path.join(OUT_DIR, "sensitivity-tiny-llama-4bit.txt")
    if os.path.exists(sens_path):
        os.remove(sens_path)  # save_sensitivity_log appends by design
    save_sensitivity_log(res.losses, sens_path)
    print(f"wrote {OUT_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
