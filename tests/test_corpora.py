"""Corpus-layout prep tests on fabricated mini corpora."""

import json
import os

import numpy as np
import pytest

from audiocodecs_tpu.downstream.datasets.corpora import (
    prepare_librimix,
    prepare_speechcommands,
    prepare_voicebank,
)
from audiocodecs_tpu.downstream.datasets.manifest import read_manifest
from audiocodecs_tpu.utils.audio import write_wav


def _wav(path, seconds=0.1, sr=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_wav(path, np.zeros(int(sr * seconds), np.float32), sr)


def test_voicebank_prep(tmp_path):
    root = str(tmp_path)
    for uid in ("p1_001", "p1_002"):
        _wav(f"{root}/clean_trainset_28spk_wav/{uid}.wav")
        _wav(f"{root}/noisy_trainset_28spk_wav/{uid}.wav")
    _wav(f"{root}/clean_trainset_28spk_wav/orphan.wav")  # no noisy pair
    out = prepare_voicebank(root, root)
    rows = read_manifest(out["train"])
    assert len(rows) == 2
    assert all("noisy_wav" in r and os.path.exists(r["noisy_wav"])
               for r in rows)


def test_librimix_prep(tmp_path):
    root = str(tmp_path)
    for uid in ("a", "b"):
        for sub in ("mix_clean", "s1", "s2"):
            _wav(f"{root}/wav16k/min/dev/{sub}/{uid}.wav")
    out = prepare_librimix(root, root)
    rows = read_manifest(out["valid"])
    assert len(rows) == 2
    assert {"mix_wav", "src2_wav"} <= set(rows[0])


def test_libri1mix_prep(tmp_path):
    """1-speaker noisy mixture (libri1mix-test.yaml knobs): mix_single
    layout, rows carry in_wav for noisy-in/clean-out evaluation."""
    root = str(tmp_path)
    for uid in ("a", "b"):
        for sub in ("mix_single", "s1"):
            _wav(f"{root}/wav16k/min/test/{sub}/{uid}.wav")
    out = prepare_librimix(root, root, num_speakers=1, add_noise=True)
    rows = read_manifest(out["test"])
    assert len(rows) == 2
    assert "in_wav" in rows[0] and "src2_wav" not in rows[0]
    assert rows[0]["in_wav"].endswith(f"mix_single/{rows[0]['ID']}.wav")


def test_speechcommands_prep(tmp_path):
    root = str(tmp_path)
    _wav(f"{root}/yes/a.wav")
    _wav(f"{root}/yes/b.wav")
    _wav(f"{root}/no/c.wav")
    _wav(f"{root}/_background_noise_/x.wav")
    with open(f"{root}/validation_list.txt", "w") as f:
        f.write("yes/b.wav\n")
    out = prepare_speechcommands(root, root)
    train = read_manifest(out["train"])
    valid = read_manifest(out["valid"])
    assert {r["utt_label"] for r in train} == {"yes", "no"}
    assert len(valid) == 1 and valid[0]["utt_label"] == "yes"


def test_loader_prefetch_workers(tmp_path):
    """Threaded prefetch yields identical batches in identical order
    (reference `dataloader_workers`, tasks/asr.yaml:34)."""
    import numpy as np

    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader

    rows = []
    for i in range(7):
        p = f"{tmp_path}/u{i}.wav"
        _wav(p, seconds=0.1 + 0.05 * i)
        rows.append({"ID": f"u{i}", "duration": 0.1 + 0.05 * i, "wav": p})
    serial = BucketedLoader(rows, 16000, batch_size=2, num_buckets=2)
    threaded = BucketedLoader(rows, 16000, batch_size=2, num_buckets=2,
                              num_workers=3, prefetch=2)
    a, b = list(serial), list(threaded)
    assert len(a) == len(b) > 1
    for x, y in zip(a, b):
        assert x["ids"] == y["ids"]
        np.testing.assert_array_equal(x["sig"], y["sig"])
        np.testing.assert_array_equal(x["length"], y["length"])
