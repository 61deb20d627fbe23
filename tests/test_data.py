"""Calibration-data RNG parity tests (offline: datasets are mocked).

PPL parity with the reference requires byte-identical token windows, i.e.
the exact `random.seed`/`randint` call sequence of the reference loaders
(reference: datautils.py:10-103). The oracles below re-implement the
reference's algorithm verbatim and must select identical windows.
"""

import random
import sys
import types

import numpy as np
import pytest

from gptq_tpu import data as data_mod
from gptq_tpu.data import TokenStream, _sample_windows, get_loaders, synthetic_stream


class FakeTokenizer:
    """Deterministic 'tokenizer': hashes words to ids."""

    def __call__(self, text, **kw):
        ids = [hash(w) % 1000 for w in text.split()]
        return types.SimpleNamespace(input_ids=ids)


class FakeSplit:
    def __init__(self, rows, key):
        self.rows = rows
        self.key = key

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        if isinstance(i, str):
            return [r for r in self.rows]
        return {self.key: self.rows[i]}


def test_sample_windows_matches_reference_rng():
    """_sample_windows == the reference's seed/randint loop
    (reference: datautils.py:21-31)."""
    total, seqlen, nsamples, seed = 5000, 64, 7, 3
    trainenc = np.arange(total)[None]
    got = _sample_windows(trainenc, nsamples, seed, seqlen)

    random.seed(seed)
    want = []
    for _ in range(nsamples):
        i = random.randint(0, total - seqlen - 1)
        want.append(np.arange(total)[i : i + seqlen])
    np.testing.assert_array_equal(got, np.stack(want))


def test_c4_retry_loop_matches_reference_rng(monkeypatch):
    """The c4 per-document retry loop consumes randints exactly like the
    reference (reference: datautils.py:70-79): a rejected short document
    still advances the RNG."""
    rng = np.random.default_rng(0)
    # mix of short and long documents so the retry loop actually rejects
    docs = []
    for i in range(50):
        n_words = int(rng.integers(4, 40))
        docs.append(" ".join(f"w{i}_{j}" for j in range(n_words)))
    tok = FakeTokenizer()
    seqlen, nsamples, seed = 16, 5, 11

    fake_ds = types.SimpleNamespace(
        load_dataset=lambda *a, **k: FakeSplit(
            docs, "text"))
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    train, val = data_mod.get_c4(nsamples, seed, seqlen, tok)

    # reference oracle (verbatim algorithm)
    random.seed(seed)
    want = []
    for _ in range(nsamples):
        while True:
            i = random.randint(0, len(docs) - 1)
            enc = np.asarray(tok(docs[i]).input_ids)
            if enc.shape[0] >= seqlen:
                break
        i = random.randint(0, enc.shape[0] - seqlen - 1)
        want.append(enc[i : i + seqlen])
    np.testing.assert_array_equal(train, np.stack(want))

    # val: 256 windows with seed 0 (reference: datautils.py:85-96)
    random.seed(0)
    vwant = []
    for _ in range(256):
        while True:
            i = random.randint(0, len(docs) - 1)
            enc = np.asarray(tok(docs[i]).input_ids)
            if enc.shape[0] >= seqlen:
                break
        i = random.randint(0, enc.shape[0] - seqlen - 1)
        vwant.append(enc[i : i + seqlen])
    np.testing.assert_array_equal(val.input_ids.reshape(-1),
                                  np.concatenate(vwant))


def test_wikitext_join_and_loader_dispatch(monkeypatch):
    """wikitext2 joins with \\n\\n (reference: datautils.py:13-16) and
    get_loaders dispatches by substring (reference: datautils.py:166-178)."""
    texts = [f"line {i} alpha beta" for i in range(200)]
    joined = {}

    class JoinSpyTokenizer(FakeTokenizer):
        def __call__(self, text, **kw):
            joined["text"] = text
            return super().__call__(text, **kw)

    fake_ds = types.SimpleNamespace(
        load_dataset=lambda *a, **k: FakeSplit(texts, "text"))
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    train, test = get_loaders("wikitext2", nsamples=3, seed=0, seqlen=8,
                              tokenizer=JoinSpyTokenizer())
    assert "\n\n" in joined["text"]
    assert train.shape == (3, 8)
    assert isinstance(test, TokenStream)
    with pytest.raises(ValueError):
        get_loaders("no-such-dataset")


def test_synthetic_stream_deterministic():
    a = synthetic_stream(97, 1000, seed=4)
    b = synthetic_stream(97, 1000, seed=4)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() < 97
