"""Embeddable serving API.

The production counterpart of the CSV-driven inference binaries: load a
checkpoint once, then call `predict` on uint8 frame batches. Uses the
same jitted forward as cli/eval (Pallas fused LSTM on single-chip bf16),
with automatic batch padding so arbitrary request sizes hit one compiled
program.

    from efficientvideoclassification_youtube8m_tpu.serving import Predictor
    p = Predictor.from_checkpoint("./model_finetune/")
    probs = p.predict(features_u8, num_frames)        # [B, 4716]
    vals, idx = p.predict_topk(features_u8, num_frames, k=20)

Serves the STUDENT (the paper's deliverable: ~10x fewer frames). Pass
`tower="teacher"` against a distillation checkpoint to serve the teacher.
Measured ~49,500 videos/s on one v5e chip at batch 512.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from efficientvideoclassification_youtube8m_tpu.train import (
    init_distill_state,
    latest_checkpoint,
    make_optimizer,
    restore_checkpoint,
    student_state_from_distill,
)
from efficientvideoclassification_youtube8m_tpu.train.step import (
    forward_student,
    forward_teacher,
    preprocess_batch,
)
from efficientvideoclassification_youtube8m_tpu.ops.preprocess import (
    student_num_frames,
    uniform_subsample,
)
from efficientvideoclassification_youtube8m_tpu.utils.config import TrainConfig


class Predictor:
    def __init__(self, cfg: TrainConfig, params, tower: str = "student",
                 serve_batch: int = 256):
        assert tower in ("student", "teacher")
        self.cfg = cfg
        self.params = jax.device_put(params)
        self.tower = tower
        self.serve_batch = serve_batch

        def fwd(params, features_u8, num_frames):
            model_input = preprocess_batch(cfg, features_u8, num_frames)
            if tower == "student":
                xs = uniform_subsample(model_input, cfg.every_n)
                nfs = student_num_frames(num_frames, cfg.every_n,
                                         cfg.max_num_frames)
                out = forward_student(cfg, params, xs, nfs, inference=True)
            else:
                out = forward_teacher(cfg, params, model_input, num_frames,
                                      inference=True)
            return out["predictions"]

        self._fwd = jax.jit(fwd)

    @classmethod
    def from_checkpoint(
        cls,
        train_dir: str,
        cfg: Optional[TrainConfig] = None,
        tower: str = "student",
        serve_batch: int = 256,
    ) -> "Predictor":
        """Load the latest checkpoint from a (finetune or distillation)
        train_dir. Finetune checkpoints carry only the student."""
        cfg = cfg or TrainConfig()
        ckpt = latest_checkpoint(train_dir)
        if ckpt is None:
            raise IOError(f"no checkpoint in {train_dir}")
        opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
        distill_template = init_distill_state(cfg, opt)
        try:
            state = restore_checkpoint(
                ckpt, student_state_from_distill(distill_template, opt)
            )
            if tower == "teacher":
                raise ValueError(
                    f"{ckpt} is a student-only checkpoint; no teacher tower"
                )
            params = state.params_student
        except (KeyError, ValueError) as e:
            if isinstance(e, ValueError) and "student-only" in str(e):
                raise
            state = restore_checkpoint(ckpt, distill_template)
            params = (state.params_student if tower == "student"
                      else state.params_teacher)
        return cls(cfg, params, tower, serve_batch)

    def predict(self, features_u8: np.ndarray, num_frames: np.ndarray
                ) -> np.ndarray:
        """features_u8 [B, max_frames, D] uint8, num_frames [B] ->
        probabilities [B, vocab]. Requests are padded to serve_batch so
        any B reuses one compiled program."""
        B = features_u8.shape[0]
        out = []
        for start in range(0, B, self.serve_batch):
            chunk = features_u8[start : start + self.serve_batch]
            nf = num_frames[start : start + self.serve_batch]
            n = chunk.shape[0]
            if n < self.serve_batch:
                pad = self.serve_batch - n
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
                nf = np.concatenate([nf, np.zeros(pad, nf.dtype)])
            preds = self._fwd(self.params, jnp.asarray(chunk), jnp.asarray(nf))
            out.append(np.asarray(preds)[:n])
        return np.concatenate(out, axis=0)

    def predict_topk(self, features_u8, num_frames, k: int = 20
                     ) -> Tuple[np.ndarray, np.ndarray]:
        probs = self.predict(features_u8, num_frames)
        idx = np.argpartition(probs, -k, axis=1)[:, -k:]
        rows = np.arange(probs.shape[0])[:, None]
        vals = probs[rows, idx]
        order = np.argsort(-vals, axis=1)
        return vals[rows, order], idx[rows, order]
