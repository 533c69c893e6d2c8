"""Quick-tier unit tests for serve.py's building blocks (the full daemon
drive lives in test_serve.py, slow tier): MicroBatcher grouping/keying and
the streaming WAV header."""

import threading
import time

import numpy as np


class _FakeSynth:
    """Records synthesize() calls; returns one short wav per text."""

    def __init__(self):
        self.calls = []

    def synthesize(self, texts, speaker, **knobs):
        if isinstance(texts, str):
            texts = [texts]
        self.calls.append((list(texts), speaker, dict(knobs)))
        time.sleep(0.01)
        return [np.full(100 + 10 * j, 0.1, np.float32)
                for j in range(len(texts))], {}


def test_microbatcher_groups_same_key():
    from serve import MicroBatcher

    synth = _FakeSynth()
    b = MicroBatcher(synth, threading.Lock(), max_batch=8, wait_ms=150)
    knobs = {"sigma": 0.8}
    results = [None] * 4

    def fire(ix):
        results[ix] = b.synthesize_one(("ljs", (("sigma", 0.8),)),
                                       f"text {ix}", knobs, "ljs")

    threads = [threading.Thread(target=fire, args=(ix,)) for ix in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert all(r is not None for r in results)
    assert b.dispatches == 1, synth.calls
    assert sorted(len(t) for t, _, _ in synth.calls) == [4]
    # each requester got the wav for ITS text (row order preserved)
    texts_in_call = synth.calls[0][0]
    for ix in range(4):
        row = texts_in_call.index(f"text {ix}")
        assert len(results[ix]) == 100 + 10 * row


def test_microbatcher_separates_keys():
    from serve import MicroBatcher

    synth = _FakeSynth()
    b = MicroBatcher(synth, threading.Lock(), max_batch=8, wait_ms=120)
    results = {}

    def fire(name, key):
        results[name] = b.synthesize_one(key, name, {"sigma": 0.5}, key[0])

    t1 = threading.Thread(target=fire,
                          args=("a", ("spk1", (("sigma", 0.5),))))
    t2 = threading.Thread(target=fire,
                          args=("b", ("spk2", (("sigma", 0.5),))))
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    assert set(results) == {"a", "b"}
    # different keys may NOT share a dispatch
    assert b.dispatches == 2
    assert all(len(texts) == 1 for texts, _, _ in synth.calls)


def test_microbatcher_propagates_errors():
    from serve import MicroBatcher

    class _Boom:
        def synthesize(self, texts, speaker, **knobs):
            raise RuntimeError("boom")

    b = MicroBatcher(_Boom(), threading.Lock(), wait_ms=10)
    try:
        b.synthesize_one(("s", ()), "t", {}, "s")
        raise AssertionError("expected RuntimeError")
    except RuntimeError as exc:
        assert "boom" in str(exc)


def test_streaming_wav_header_fields():
    import struct

    from serve import _streaming_wav_header

    h = _streaming_wav_header(22050)
    assert len(h) == 44
    assert h[:4] == b"RIFF" and h[8:16] == b"WAVEfmt "
    assert struct.unpack("<I", h[4:8])[0] == 0xFFFFFFFF
    size, fmt, ch, sr, brate, align, bits = struct.unpack("<IHHIIHH",
                                                          h[16:36])
    assert (size, fmt, ch, sr) == (16, 3, 1, 22050)
    assert (brate, align, bits) == (22050 * 4, 4, 32)
    assert h[36:40] == b"data"
    assert struct.unpack("<I", h[40:44])[0] == 0xFFFFFFFF
