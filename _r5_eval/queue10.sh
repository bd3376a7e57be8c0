#!/bin/bash
# Round-5 TPU queue 10: campaign-recipe GENERALITY test on a second labeled
# dataset (juxtacellular-mouse-s1-celltype). Recipe frozen from the
# cellexplorer-celltype campaign BEFORE touching this dataset:
#   time stage-1 start = 4-seed pool ensemble @ lr 3e-3, VAL winner
#   wave stage-1 start = 4-seed pool ensemble @ lr 1e-3, fold-screened on
#     the seed-42 partition (the one selection step the celltype campaign
#     used), then the combined recipe confirmed on partitions 43/44.
cd /root/repo
DS=juxtacellular-mouse-s1-celltype
B=_r5_eval/ds2_base/ckpt/${DS}
log() { echo "[queue10 $(date +%H:%M:%S)] $*" >> _r5_eval/queue10.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

# 1. baseline pipeline (honest protocol) -> pool + sup ckpts
run ds2_base_train python scripts/train_model.py --dataset $DS \
  --pretrain-max-epochs 120 --finetune-max-epochs 120 --supervised-max-epochs 120 \
  --honest-eval --output-dir _r5_eval/ds2_base --checkpoint-dir _r5_eval/ds2_base/ckpt

# 2. frozen-recipe sweeps
run ds2_sweep_time python scripts/lr_sweep.py --dataset $DS \
  --modality time --pool pretrain --mode seeds --n-seeds 4 --lr 3e-3 \
  --max-epochs 120 --patience 30 --export-winner _r5_eval/ds2_time_seed.ckpt
run ds2_sweep_wave python scripts/lr_sweep.py --dataset $DS \
  --modality wave --pool pretrain --mode seeds --n-seeds 4 --lr 1e-3 \
  --max-epochs 120 --patience 30 --export-all _r5_eval/ds2_wcand_

# 3. seed-42 partition: pool baseline + wave-candidate screen (time fixed)
run ds2_kfold_s42_pool python scripts/kfold_eval.py --dataset $DS \
  --wave-checkpoint ${B}_wave_model.ckpt --time-checkpoint ${B}_time_model.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --seed 42 \
  --output-dir _r5_eval/ds2_kfold_s42_pool
for K in 0 1 2 3; do
  run ds2_screen_w$K python scripts/kfold_eval.py --dataset $DS \
    --wave-checkpoint _r5_eval/ds2_wcand_$K.ckpt \
    --time-checkpoint _r5_eval/ds2_time_seed.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel --seed 42 \
    --output-dir _r5_eval/ds2_screen_w$K
done

# 4. confirmation partitions for the pool baseline (the final arm runs in
# queue11 once the screen picks the wave candidate)
for S in 43 44; do
  run ds2_kfold_s${S}_pool python scripts/kfold_eval.py --dataset $DS \
    --wave-checkpoint ${B}_wave_model.ckpt --time-checkpoint ${B}_time_model.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel --seed $S \
    --output-dir _r5_eval/ds2_kfold_s${S}_pool
done
log ALL-DONE
