#!/bin/bash
# Real-hardware soak: run the trainer on the tunneled TPU for SOAK_MINUTES,
# riding tunnel dark windows via checkpoint-resume.  Every outer iteration
# (re)starts the same trainer; orbax resume continues from the latest step,
# so crashes/hangs/outages only cost the chunk in flight.  Afterwards run
# scripts/soak_report.py on the soak dir for the summary.
#
# Usage: SOAK_MINUTES=120 bash scripts/run_soak.sh /tmp/soak
set -u
ROOT=${1:?usage: run_soak.sh <soak_dir>}
SOAK_MINUTES=${SOAK_MINUTES:-120}
CHUNK_SECS=${CHUNK_SECS:-1500}
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}

cd /root/repo
mkdir -p "$ROOT"
DEMOS="$ROOT/demos"
[ -d "$DEMOS" ] || python scripts/soak_prep.py "$DEMOS" --rows 128 --img 128

DEADLINE=$(( $(date +%s) + SOAK_MINUTES * 60 ))
RUN=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  RUN=$((RUN + 1))
  # bounded backend probe: after a dark window init can fail fast AND the
  # failure is process-cached, so each probe must be a fresh interpreter
  if ! timeout -k 30 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[soak] run $RUN: backend unavailable, sleeping 60s" | tee -a "$ROOT/soak.log"
    sleep 60
    continue
  fi
  echo "[soak] run $RUN: starting trainer chunk ($(date -u +%H:%M:%S))" | tee -a "$ROOT/soak.log"
  timeout -k 60 "$CHUNK_SECS" python -m arp_tpu.train.main \
    --epochs=100000 --warmup_epochs=1 --batch_size=32 --dataloader_n_workers=0 \
    --log_freq=50 --lr=1e-4 --window_size=4 \
    --use_vl=True --vl_type=clip --use_crop=True \
    --game_name=coinrun --val_every_epochs=0 --test_every_epochs=0 \
    --eval_env=none --save_model_freq=200 \
    --fault_policy=rollback --heartbeat_interval=30 \
    --model.model_type=vit_debug --model.transfer_type=none \
    --model.emb_dim=384 --model.depth=6 --model.num_heads=8 \
    --model.mlp_ratio=4 --model.num_ensembles=2 \
    --model.compute_dtype=bfloat16 \
    --data.path="$DEMOS" --data.image_size=128 --data.num_frames=8 \
    --data.window_size=4 --data.num_demonstrations=128 --data.use_vl=True \
    --checkpoint_dir="$ROOT/ckpt" \
    --logging.output_dir="$ROOT/out" --logging.experiment_id=soak \
    >> "$ROOT/trainer.log" 2>&1
  rc=$?
  echo "[soak] run $RUN: trainer exited rc=$rc ($(date -u +%H:%M:%S))" | tee -a "$ROOT/soak.log"
  [ $rc -eq 0 ] && break   # 100000 epochs "finished" — never expected
  sleep 5
done
python scripts/soak_report.py "$ROOT" | tee "$ROOT/soak_summary.json"
