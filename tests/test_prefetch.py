"""utils.prefetch.Prefetcher: the shared producer/consumer shape used
by RefStreamer, EncodedStream and run_align's pool reader."""

import threading
import time

import pytest

from uvaia_tpu.utils.prefetch import Prefetcher


def test_items_in_order():
    pf = Prefetcher(lambda: iter(range(100)), maxsize=3)
    assert list(pf) == list(range(100))


def test_producer_error_surfaces_after_drain():
    """Items read before the fault are delivered, then the error."""
    def produce():
        yield 1
        yield 2
        raise RuntimeError("boom")

    pf = Prefetcher(produce, maxsize=8)
    got = []
    with pytest.raises(RuntimeError, match="boom"):
        for x in pf:
            got.append(x)
    assert got == [1, 2]


def test_consumer_break_unblocks_producer():
    """A consumer that stops early must not leave the producer blocked
    on the bounded queue forever (the round-2 hazard in stream.py)."""
    finished = threading.Event()

    def produce():
        try:
            for i in range(10_000):
                yield i
        finally:
            finished.set()

    pf = Prefetcher(produce, maxsize=1)
    it = iter(pf)
    assert next(it) == 0
    it.close()                       # consumer walks away
    assert finished.wait(5.0), "producer thread stayed blocked"


def test_consumer_exception_unblocks_producer():
    finished = threading.Event()

    def produce():
        try:
            while True:
                yield object()
        finally:
            finished.set()

    pf = Prefetcher(produce, maxsize=1)
    with pytest.raises(ValueError):
        for _ in pf:
            raise ValueError("consumer died")
    assert finished.wait(5.0)


def test_chained_prefetchers_propagate_abort():
    """EncodedStream-over-RefStreamer shape: aborting the outer consumer
    must close the inner producer too (deterministically, not via GC)."""
    inner_done = threading.Event()

    def inner():
        try:
            while True:
                yield 1
        finally:
            inner_done.set()

    inner_pf = Prefetcher(inner, maxsize=1)

    def outer():
        for x in inner_pf:
            yield x * 2

    outer_pf = Prefetcher(outer, maxsize=1)
    it = iter(outer_pf)
    assert next(it) == 2
    it.close()
    assert inner_done.wait(5.0), "inner producer not closed on abort"


def test_aborted_flag_visible_to_producer():
    seen = []

    def produce():
        for i in range(1000):
            if pf.aborted():
                return
            seen.append(i)
            yield i
            time.sleep(0.001)

    pf = Prefetcher(produce, maxsize=1)
    it = iter(pf)
    next(it)
    pf.abort()
    it.close()
    time.sleep(0.3)
    assert len(seen) < 1000


@pytest.mark.parametrize("workers", [1, 3])
def test_encoded_stream_pool_order_and_equivalence(tmp_path, workers):
    """EncodedStream's worker pool (UVAIA_TPU_ENCODE_THREADS) yields
    batches in input order with payloads identical to the serial
    path, across delta and packed-fallback batches."""
    import numpy as np

    from uvaia_tpu.core.encoding import ENCODE_LUT
    from uvaia_tpu.engine.stream import EncodedStream, RefStreamer

    rng = np.random.default_rng(11)
    L, N, POOL = 400, 37, 8
    base = ENCODE_LUT[np.frombuffer(
        bytes(bytearray(b"ACGT"[i] for i in rng.integers(0, 4, L))),
        np.uint8)]
    path = tmp_path / "db.fa"
    with open(path, "w") as f:
        for i in range(N):
            row = bytearray(b"ACGT"[j] for j in rng.integers(0, 4, L)) \
                if i % 5 == 0 else bytearray(
                    np.frombuffer(b"ACGT", np.uint8)[
                        (base - 1) % 4].tobytes())
            for _ in range(rng.integers(0, 4)):
                row[rng.integers(0, L)] = ord("N")
            f.write(f">s{i}\n{row.decode()}\n")

    def collect(w):
        streamer = RefStreamer([str(path)], L, POOL)
        out = []
        for batch, payload in EncodedStream(streamer, base, workers=w):
            out.append((batch.names[:batch.n], payload[0],
                        [np.asarray(p).tobytes() for p in payload[1:]]))
        return out

    got = collect(workers)
    want = collect(1)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert [g[1] for g in got] == [w[1] for w in want]
    # identical payload bytes batch-for-batch
    for g, w in zip(got, want):
        assert g[2] == w[2]
