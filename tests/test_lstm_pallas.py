"""Fused Pallas LSTM dispatch guards."""

import jax


def test_pallas_auto_guard_vmem(monkeypatch):
    """Auto mode must skip the fused kernel when w_hh would overflow the
    ~16 MB scoped VMEM (H=1024 hit by SpeechTokenizer's BiLSTM)."""
    from audiocodecs_tpu.nn import lstm as lstm_mod

    monkeypatch.setenv("ACX_PALLAS_LSTM", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert lstm_mod._pallas_enabled(512)
    assert lstm_mod._pallas_enabled(768)
    assert not lstm_mod._pallas_enabled(1024)
    assert not lstm_mod._pallas_enabled(130)  # lane alignment
    # ACX_PALLAS_LSTM_WIDE=1 raises the cap to 1536 (vmem_limit_bytes is
    # lifted inside the kernel call; BigCodec's H=1536 bottleneck)
    monkeypatch.setenv("ACX_PALLAS_LSTM_WIDE", "1")
    assert lstm_mod._pallas_enabled(1024)
    assert lstm_mod._pallas_enabled(1536)
    assert not lstm_mod._pallas_enabled(2048)
    assert not lstm_mod._pallas_enabled(130)
