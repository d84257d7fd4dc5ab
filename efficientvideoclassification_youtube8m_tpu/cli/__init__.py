"""Entry-point binaries mirroring the reference's five-binary pipeline:

  train     -> train.py              (teacher+student distillation)
  validate  -> validate.py           (student eval with teacher present)
  convert   -> train_convert_model.py (checkpoint surgery)
  finetune  -> train_finetune.py     (student-only training)
  eval      -> eval_finetune.py      (student-only eval)
  infer     -> inference_*.py        (CSV inference, bias rescaling)
  inference_ensemble, max_ensemble, inspect_checkpoint, hash_check
  export_tf -> (no reference analog)  (write a TF-V2 bundle the
               reference's TF1 binaries can restore — interop back out)

Run as `python -m efficientvideoclassification_youtube8m_tpu.cli.<name>`.
"""
