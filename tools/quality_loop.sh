#!/bin/bash
# Offline end-to-end quality loop (RESULTS.md): scratch-trained tiny
# EnCodec on the deterministic 240-utt synthetic corpus, then the SR /
# SLM / TTS / ASR / SE recipes against it with the full (gated) metric
# battery. Each step is one recipe command; logs + summary.json land in
# runs/quality/<task>/.
#
# Usage: bash tools/quality_loop.sh [skip_codec]
#   skip_codec: reuse runs/quality/codec_synth.npz instead of retraining.
set -u
cd /root/repo
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
Q=runs/quality
mkdir -p "$Q"
RECIPES=(python -m audiocodecs_tpu.downstream.recipes)
AXES=(hparams/codecs/encodec_synth.yaml hparams/datasets/synthetic-quality.yaml)

# Prep the corpus EXPLICITLY before anything trains off runs/corpus —
# prepare_data's fingerprint check (generator version + knobs) regenerates
# a stale corpus here rather than letting train_codec read old audio.
python - <<'EOF' || exit 1
from audiocodecs_tpu.downstream.config import parse_cli
from audiocodecs_tpu.downstream.recipes.common import prepare_data

cfg, _ = parse_cli(["hparams/tasks/sr.yaml",
                    "hparams/codecs/encodec_synth.yaml",
                    "hparams/datasets/synthetic-quality.yaml"])
cfg = prepare_data(cfg)
print("corpus ready:", cfg["test_csv"])
EOF

if [ "${1:-}" != "skip_codec" ]; then
  # Waveform-first curriculum: the phase-blind spectral term engaged at
  # step 0 traps training at a phase-incoherent optimum (recon pinned at
  # signal power) — delay it until the waveform term has phase-locked.
  python examples/train_codec.py --steps 3000 --batch 16 --seconds 1.0 \
    --lr 4e-4 --spec-weight 2.0 --spec-delay 1200 --spec-ramp 300 \
    --cosine-decay \
    --train-manifest runs/corpus/train.csv \
    --valid-manifest runs/corpus/valid.csv \
    --log-every 100 --out "$Q/codec_synth.npz" \
    > "$Q/train_codec.log" 2>&1 || exit 1
fi

echo "=== SR (resynthesis eval) $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" sr hparams/tasks/sr.yaml "${AXES[@]}" \
  --output_folder "$Q/sr" --save_audios true \
  > "$Q/sr.log" 2>&1
echo "sr rc=$?" | tee -a "$Q/loop.log"

echo "=== SLM $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" slm hparams/tasks/slm.yaml "${AXES[@]}" \
  --output_folder "$Q/slm" --epochs 40 --batch_size 8 \
  --codec.num_codebooks 2 --d_model 128 --num_layers 2 --num_heads 4 \
  --num_kv_heads 2 --ffn_dim 344 --lr 0.002 --gen_frames 50 \
  --save_gen_audios 8 \
  > "$Q/slm.log" 2>&1
echo "slm rc=$?" | tee -a "$Q/loop.log"

echo "=== TTS $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" tts hparams/tasks/tts.yaml "${AXES[@]}" \
  --output_folder "$Q/tts" --epochs 40 --batch_size 8 \
  --codec.num_codebooks 2 --d_model 128 --num_layers 2 --num_heads 4 \
  --num_kv_heads 2 --ffn_dim 344 --lr 0.002 --gen_frames 120 \
  --save_gen_audios 8 \
  > "$Q/tts.log" 2>&1
echo "tts rc=$?" | tee -a "$Q/loop.log"

echo "=== ASR $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" asr hparams/tasks/asr.yaml "${AXES[@]}" \
  --output_folder "$Q/asr" --epochs 60 --batch_size 4 --token_type char \
  --lr 0.002 --lr_patience 15 \
  > "$Q/asr.log" 2>&1
echo "asr rc=$?" | tee -a "$Q/loop.log"

echo "=== KS (keyword spotting) $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" ks hparams/tasks/ks.yaml "${AXES[@]}" \
  --output_folder "$Q/ks" --epochs 60 --batch_size 4 --lr 0.002 --lr_patience 8 \
  > "$Q/ks.log" 2>&1
echo "ks rc=$?" | tee -a "$Q/loop.log"

echo "=== SE (enhancement) $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" se hparams/tasks/se.yaml "${AXES[@]}" \
  --output_folder "$Q/se" --epochs 40 --batch_size 8 \
  --d_model 128 --num_layers 2 --ffn_dim 344 \
  > "$Q/se.log" 2>&1
echo "se rc=$?" | tee -a "$Q/loop.log"

echo "=== SI (speaker id) $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" si hparams/tasks/si.yaml "${AXES[@]}" \
  --output_folder "$Q/si" --epochs 60 --batch_size 4 --lr 0.002 --lr_patience 8 \
  > "$Q/si.log" 2>&1
echo "si rc=$?" | tee -a "$Q/loop.log"

echo "=== SS (separation) $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" ss hparams/tasks/ss.yaml "${AXES[@]}" \
  --output_folder "$Q/ss" --epochs 40 --batch_size 8 \
  --d_model 128 --num_layers 2 --ffn_dim 344 --lr 0.002 --lr_patience 8 \
  > "$Q/ss.log" 2>&1
echo "ss rc=$?" | tee -a "$Q/loop.log"

echo "=== VC (voice conversion test) $(date)" | tee -a "$Q/loop.log"
"${RECIPES[@]}" vc hparams/tasks/vc.yaml "${AXES[@]}" \
  --output_folder "$Q/vc" \
  > "$Q/vc.log" 2>&1
echo "vc rc=$?" | tee -a "$Q/loop.log"

echo "=== done $(date)" | tee -a "$Q/loop.log"
