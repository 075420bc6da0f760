"""Production-style codec serving loop: dynamic batching over jitted shapes.

The TPU wants large static-shape batches; requests arrive one at a time
with arbitrary lengths. This example shows the serving pattern the
framework is designed around:

  * requests are padded up to a small set of LENGTH BUCKETS (each bucket =
    one compiled XLA program, reused forever);
  * a collector thread groups same-bucket requests into batches up to
    ``--batch`` (the sublane-aligned sweet spot — see BENCH_NOTES.md batch
    sweep) or until ``--max-wait-ms`` passes;
  * the device runs one jitted roundtrip per batch; JAX async dispatch
    overlaps the next batch's host→device transfer with compute (same
    double-buffering as ``utils.windowed``).

Run (synthesizes its own request stream):

    python examples/serve.py --codec encodec --requests 32 --batch 8
"""

from __future__ import annotations

import queue
import sys
import threading
import time

import numpy as np


def arg(name, default, cast=str):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


class CodecServer:
    """Dynamic-batching frontend over a codec's jitted roundtrip."""

    def __init__(self, codec, buckets_s=(1.0, 2.0, 5.0, 10.0),
                 max_batch: int = 8, max_wait_ms: float = 5.0):
        self.codec = codec
        self.sr = codec.config.sample_rate
        self.buckets = [int(b * self.sr) for b in sorted(buckets_s)]
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.queues = {b: queue.Queue() for b in self.buckets}
        self._stop = threading.Event()

        jfn = codec.jitted_roundtrip()  # params as jit args (no closure)
        self._fn = lambda sig: jfn(codec.params, sig)
        self._threads = [
            threading.Thread(target=self._worker, args=(b,), daemon=True)
            for b in self.buckets
        ]
        for t in self._threads:
            t.start()

    def submit(self, wav: np.ndarray) -> "queue.Queue":
        """Enqueue one mono request [T]; returns a queue delivering [T].

        Requests longer than the largest bucket are rejected loudly —
        silently truncating would deliver fewer samples than promised
        (route long audio through utils.windowed instead).
        """
        T = wav.shape[0]
        if T > self.buckets[-1]:
            raise ValueError(
                f"request of {T} samples exceeds the largest bucket "
                f"({self.buckets[-1]}); use windowed_reconstruct for "
                f"long audio or configure a larger bucket")
        bucket = next(b for b in self.buckets if T <= b)
        out: queue.Queue = queue.Queue(1)
        self.queues[bucket].put((wav, T, out))
        return out

    def _worker(self, bucket: int):
        import jax.numpy as jnp

        q = self.queues[bucket]
        while not self._stop.is_set():
            try:
                first = q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(q.get(timeout=remaining))
                except queue.Empty:
                    break
            # pad the batch dim to max_batch: ONE compiled program per
            # bucket (dynamic batch sizes would trace a program per
            # (bucket, size) pair — multi-second stalls under bursty load)
            sigs = np.zeros((self.max_batch, bucket), np.float32)
            for i, (wav, T, _) in enumerate(batch):
                sigs[i, : wav.shape[0]] = wav
            rec = self._fn(jnp.asarray(sigs))  # async dispatch
            rec = np.asarray(rec)
            for i, (_, T, out) in enumerate(batch):
                out.put(rec[i, :T])

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)


def main():
    import jax

    from audiocodecs_tpu.models import get_codec_class

    name = arg("--codec", "encodec")
    n_requests = arg("--requests", 16, int)
    max_batch = arg("--batch", 8, int)

    # measured-fastest token-exact mode for this family (BENCH_NOTES);
    # must run before the first trace
    from audiocodecs_tpu.serving import apply_serving_preset

    preset = apply_serving_preset(name, arg("--quality", "balanced"))
    if preset:
        print(f"serving preset[{name}]: {preset}")

    cls = get_codec_class(name)
    sr = getattr(cls, "DEFAULT_ORIG_SR", 24000)
    codec = cls(sample_rate=sr, orig_sample_rate=sr,
                key=jax.random.PRNGKey(0))
    server = CodecServer(codec, max_batch=max_batch)

    rng = np.random.default_rng(0)
    t0 = time.time()
    futures = []
    total_audio = 0.0
    for i in range(n_requests):
        dur = float(rng.uniform(0.5, 8.0))
        total_audio += dur
        t = np.arange(int(dur * sr)) / sr
        wav = np.sin(2 * np.pi * (200 + 50 * i) * t).astype(np.float32)
        futures.append((wav.shape[0], server.submit(wav)))
    recs = [f.get(timeout=600) for _, f in futures]
    wall = time.time() - t0
    for (T, _), rec in zip(futures, recs):
        assert rec.shape[0] == T and np.isfinite(rec).all()
    print(f"{n_requests} requests ({total_audio:.1f}s audio) served in "
          f"{wall:.2f}s -> {total_audio / wall:.1f}x real-time "
          f"(incl. all compiles)")
    server.stop()


if __name__ == "__main__":
    main()
