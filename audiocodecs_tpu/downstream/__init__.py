"""Downstream benchmark suite (tasks × codecs × datasets).

TPU-native re-design of the reference's SpeechBrain-based ``downstream/``
harness: recipes are pure-JAX train/eval loops over a ``(data, model)`` mesh,
configs are dataclass-composed (task × codec × dataset), metrics are
first-party JAX DSP where possible and gated external models elsewhere.
"""
