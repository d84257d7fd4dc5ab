#!/bin/bash
# Checkpoint surgery: teacher-student -> standalone student in
# <train_dir minus 'train'>finetune/ (train_convert_model.py:398-401).
set -e
TRAIN_DIR=${TRAIN_DIR:-./model_HLSTM_TeaStud_every10_train/}
time python -u -m efficientvideoclassification_youtube8m_tpu.cli.convert \
  --train_dir "$TRAIN_DIR" \
  --frame_features True --feature_names "rgb, audio" --feature_sizes "1024, 128" \
  --model "HierarchicalLstmModel" --batch_size 128 --num_inputs_to_lstm 20 \
  --lstm_layers 2 --every_n 10 &> output_HLSTM_TeaStud_every10_convertModel
