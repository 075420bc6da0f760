"""Trainer infrastructure: gradient accumulation + interval checkpoints.

The reference exposes ``grad_accumulation_factor`` and
``ckpt_interval_steps`` through SpeechBrain run-opts
(``hparams/tasks/asr.yaml:30,38``); these tests pin the JAX Trainer's
equivalents: k accumulated microbatches apply ONE optimizer update on the
mean gradient (bit-equal to a single full-batch step), and mid-epoch
checkpoints appear every N steps.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from audiocodecs_tpu.downstream.recipes.trainer import Trainer, trainer_kwargs


def _quadratic_loss(params, batch, key):
    del key
    pred = batch["x"] @ params["w"]
    return jnp.mean((pred - batch["y"]) ** 2), {}


def _data(n=8, d=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.standard_normal((n, 1)).astype(np.float32)
    return x, y


def test_grad_accumulation_matches_full_batch(tmp_path):
    """k=2 over two half-batches == one step on the full batch (MultiSteps
    averages the micro-gradients; the loss is a mean, so the average of
    half-batch grads equals the full-batch grad)."""
    x, y = _data()
    w0 = np.zeros((4, 1), np.float32)

    full = Trainer(_quadratic_loss, {"w": jnp.asarray(w0)}, lr=1e-2,
                   output_folder=str(tmp_path / "full"))
    full.fit(1, lambda: iter([{"x": jnp.asarray(x), "y": jnp.asarray(y)}]))

    acc = Trainer(_quadratic_loss, {"w": jnp.asarray(w0)}, lr=1e-2,
                  output_folder=str(tmp_path / "acc"),
                  grad_accumulation_factor=2)
    acc.fit(1, lambda: iter([
        {"x": jnp.asarray(x[:4]), "y": jnp.asarray(y[:4])},
        {"x": jnp.asarray(x[4:]), "y": jnp.asarray(y[4:])},
    ]))

    np.testing.assert_allclose(np.asarray(acc.params["w"]),
                               np.asarray(full.params["w"]),
                               rtol=1e-6, atol=1e-7)


def test_grad_accumulation_lr_anneal(tmp_path):
    """_set_lr reaches the inner optimizer state through MultiSteps."""
    x, y = _data()

    def batches():
        return iter([{"x": jnp.asarray(x), "y": jnp.asarray(y)}] * 2)

    t = Trainer(_quadratic_loss, {"w": jnp.zeros((4, 1))}, lr=1e-2,
                output_folder=str(tmp_path / "anneal"),
                grad_accumulation_factor=2)
    # non-improving metric forces a NewBob halving through _set_lr
    metrics = iter([1.0, 1.0, 1.0])
    t.fit(3, batches, valid_fn=lambda p: next(metrics))
    assert t.scheduler.lr < 1e-2


def test_ckpt_interval_steps(tmp_path):
    x, y = _data()

    def batches():
        return iter([{"x": jnp.asarray(x), "y": jnp.asarray(y)}] * 3)

    out = tmp_path / "interval"
    t = Trainer(_quadratic_loss, {"w": jnp.zeros((4, 1))}, lr=1e-2,
                output_folder=str(out), ckpt_interval_steps=2)
    t.fit(1, batches)
    assert os.path.exists(out / "ckpt_latest.npz")


def test_trainer_kwargs_filter():
    cfg = {"grad_accumulation_factor": 4, "ckpt_interval_steps": 100,
           "keep_checkpoints": 2, "max_grad_norm": 1.0, "lr": 3e-4,
           "unrelated": "x"}
    kw = trainer_kwargs(cfg)
    assert kw == {"grad_accumulation_factor": 4, "ckpt_interval_steps": 100,
                  "keep_checkpoints": 2, "max_grad_norm": 1.0}


def test_bf16_precision_trains(tmp_path):
    """precision: bf16 computes the loss through a bf16 param cast but
    keeps f32 master weights; training still reduces the loss."""
    x, y = _data(n=16)

    def batches():
        return iter([{"x": jnp.asarray(x), "y": jnp.asarray(y)}] * 4)

    t = Trainer(_quadratic_loss, {"w": jnp.zeros((4, 1))}, lr=5e-2,
                output_folder=str(tmp_path / "bf16"), precision="bf16")
    first = float(_quadratic_loss(t.params, {"x": x, "y": y}, None)[0])
    t.fit(3, batches)
    assert t.params["w"].dtype == jnp.float32  # master weights stay f32
    last = float(_quadratic_loss(t.params, {"x": x, "y": y}, None)[0])
    assert last < first


def test_keep_checkpoints_prunes(tmp_path):
    """keep_checkpoints: 2 keeps the two metric-best epoch checkpoints."""
    x, y = _data()

    def batches():
        return iter([{"x": jnp.asarray(x), "y": jnp.asarray(y)}])

    out = tmp_path / "keepn"
    t = Trainer(_quadratic_loss, {"w": jnp.zeros((4, 1))}, lr=1e-3,
                output_folder=str(out), keep_checkpoints=2)
    metrics = iter([3.0, 1.0, 2.0, 0.5])  # best at epochs 2 and 4
    t.fit(4, batches, valid_fn=lambda p: next(metrics))
    kept = sorted(p.name for p in out.glob("ckpt_e*.npz"))
    assert kept == ["ckpt_e2.npz", "ckpt_e4.npz"], kept
    assert os.path.exists(out / "ckpt_best.npz")


def test_dynamic_batching_duration_cap(tmp_path):
    """dynamic_batching + max_batch_length caps total padded audio per
    batch (reference DynamicBatchSampler, utils.py:144-154); loader_kwargs
    maps the config keys."""
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader
    from audiocodecs_tpu.downstream.recipes.common import loader_kwargs

    kw = loader_kwargs({"dynamic_batching": True, "max_batch_length": 2.0,
                        "batch_size": 64, "num_length_buckets": 2})
    assert kw["batch_seconds"] == 2.0 and kw["batch_size"] == 64

    sr = 1000
    rows = [{"ID": f"u{i}", "duration": 0.9} for i in range(8)]
    sigs = {r["ID"]: np.ones(900, np.float32) for r in rows}
    loader = BucketedLoader(rows, sr, read_fn=lambda r: sigs[r["ID"]], **kw)
    for batch in loader:
        padded_seconds = batch["sig"].shape[0] * batch["sig"].shape[1] / sr
        assert padded_seconds <= 2.0 + 1e-6, padded_seconds


def test_loader_sorting_orders():
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader

    sr = 1000
    rows = ([{"ID": f"s{i}", "duration": 0.2} for i in range(2)]
            + [{"ID": f"l{i}", "duration": 0.9} for i in range(2)])
    sigs = {r["ID"]: np.ones(int(r["duration"] * sr), np.float32)
            for r in rows}

    def lengths(sorting):
        loader = BucketedLoader(rows, sr, batch_size=2, num_buckets=2,
                                read_fn=lambda r: sigs[r["ID"]],
                                sorting=sorting)
        return [b["sig"].shape[1] for b in loader]

    asc = lengths("ascending")
    assert asc == sorted(asc)
    desc = lengths("descending")
    assert desc == sorted(desc, reverse=True)
    assert sorted(lengths("random")) == sorted(asc)


def test_newbob_patience_survives_plateau(tmp_path):
    """Regression: CTC training opens with a multi-epoch all-blank plateau
    (validation metric pinned at its worst value). With the SpeechBrain
    ``patient`` equivalent at its default 0, NewBob halves the LR every
    plateau epoch and freezes training before it can escape (measured on
    the synthetic ASR run: 40 epochs stuck at WER 1.0, LR at 4e-15).
    ``lr_patience=N`` must tolerate N non-improving epochs per halving."""
    from audiocodecs_tpu.downstream.recipes.trainer import newbob_schedule

    # patience 0: a 6-epoch plateau costs a halving per epoch (the first
    # epoch "improves" over the initial best=inf, the other 5 all halve)
    s0 = newbob_schedule(1e-3, patience=0)
    for _ in range(6):
        s0.update(1.0)
    assert s0.lr == 1e-3 * 0.5**5

    # patience 12: the same plateau leaves the LR untouched
    s12 = newbob_schedule(1e-3, patience=12)
    for _ in range(6):
        s12.update(1.0)
    assert s12.lr == 1e-3
    # ...and a real improvement resets the bad-epoch counter
    s12.update(0.5)
    for _ in range(12):
        s12.update(0.5)  # within threshold -> not an improvement
    assert s12.lr == 1e-3
    s12.update(0.5)  # 13th bad epoch -> one halving
    assert s12.lr == 5e-4


def test_trainer_threads_scheduler_config(tmp_path):
    """The yaml surface (lr_annealing_factor / lr_improvement_threshold /
    lr_patience) reaches the Trainer's scheduler via trainer_kwargs."""
    cfg = {"lr_annealing_factor": 0.25, "lr_improvement_threshold": 0.01,
           "lr_patience": 3, "unrelated": "x"}
    kw = trainer_kwargs(cfg)
    assert kw == {"lr_annealing_factor": 0.25,
                  "lr_improvement_threshold": 0.01, "lr_patience": 3}
    t = Trainer(_quadratic_loss, {"w": jnp.zeros((4, 1))}, lr=1e-2,
                output_folder=str(tmp_path), **kw)
    assert t.scheduler.factor == 0.25
    assert t.scheduler.threshold == 0.01
    assert t.scheduler.patience == 3
