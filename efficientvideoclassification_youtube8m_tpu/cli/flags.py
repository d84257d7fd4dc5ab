"""argparse plumbing mirroring the reference's tf.flags surface.

Flag names/defaults match the union of the per-binary DEFINE_* blocks
(`/root/reference/code_student_uniform/train.py:27-99`,
`frame_level_models.py:16-47`, `video_level_models.py:14-19`; SURVEY.md
§2.4), so reference invocations (e.g. run_train.sh) port 1:1.
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Optional

from efficientvideoclassification_youtube8m_tpu.utils.config import TrainConfig


def _bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "t", "yes", "y")


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    # dataset / model
    p.add_argument("--train_dir", default="./tmp/model/")
    p.add_argument("--train_data_pattern", default="")
    p.add_argument("--eval_data_pattern", default="")
    p.add_argument("--input_data_pattern", default="")
    p.add_argument("--feature_names", default="rgb, audio")
    p.add_argument("--feature_sizes", default="1024, 128")
    p.add_argument("--frame_features", type=_bool, default=True)
    p.add_argument("--model", default="HierarchicalLstmModel")
    p.add_argument("--start_new_model", type=_bool, default=False,
                   nargs="?", const=True)
    p.add_argument("--num_classes", type=int, default=4716)
    p.add_argument("--bagging", type=_bool, default=False)
    # training
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--every_n", type=int, default=10)
    p.add_argument("--label_loss", default="CrossEntropyLoss")
    p.add_argument("--class_counts_file", default="",
                   help="per-class counts file for CrossEntropyLossClassImbalance")
    p.add_argument("--dropout", type=float, default=1.0)
    p.add_argument("--regularization_penalty", type=float, default=1.0)
    p.add_argument("--base_learning_rate", type=float, default=0.001)
    p.add_argument("--learning_rate_decay", type=float, default=0.95)
    p.add_argument("--learning_rate_decay_examples", type=float, default=4000000)
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--num_readers", type=int, default=4)
    p.add_argument("--optimizer", default="AdamOptimizer")
    p.add_argument("--clip_gradient_norm", type=float, default=1.0)
    p.add_argument("--log_device_placement", type=_bool, default=False)
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for flag parity; devices come from JAX")
    p.add_argument("--device", default="/gpu:0",
                   help="accepted for flag parity (inference_ensemble.py:54);"
                   " devices come from JAX")
    # model hyperparameters
    p.add_argument("--lstm_cells", type=int, default=1024)
    p.add_argument("--lstm_layers", type=int, default=2)
    p.add_argument("--max_num_frames", type=int, default=300)
    p.add_argument("--num_inputs_to_lstm", type=int, default=20)
    p.add_argument("--num_inputs_L1", type=int, default=5)
    p.add_argument("--video_level_classifier_model", default="MoeModel")
    p.add_argument("--moe_num_mixtures", type=int, default=2)
    p.add_argument("--num_hidden_units", type=int, default=1024)
    p.add_argument("--iterations", type=int, default=30)
    p.add_argument("--dbof_cluster_size", type=int, default=8192)
    p.add_argument("--dbof_hidden_size", type=int, default=1024)
    p.add_argument("--dbof_pooling_method", default="max")
    p.add_argument("--dbof_add_batch_norm", type=_bool, default=True)
    p.add_argument("--sample_random_frames", type=_bool, default=True)
    # vestigial reference flags (frame_level_models.py:20-46): registered
    # at import there but consumed by no shipped model (the atrous-conv /
    # attention experiments never landed); accepted here with the same
    # defaults so reference invocations parse. `a_rate` keeps the
    # reference's DEFINE_string-with-int-default quirk by parsing as str.
    p.add_argument("--ppfs_normalize", type=_bool, default=False)
    p.add_argument("--input_features", type=int, default=1024)
    p.add_argument("--a_rate", default="2")
    p.add_argument("--num_conv2d_layers", type=int, default=4)
    p.add_argument("--filter_size", type=int, default=10)
    p.add_argument("--att_hid_size", type=int, default=100)
    # eval / inference
    p.add_argument("--top_k", type=int, default=20)
    p.add_argument("--run_once", type=_bool, default=False,
                   nargs="?", const=True)
    # rebuild-specific
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--scan_unroll", type=int, default=15)
    p.add_argument("--use_pallas_inference", type=_bool, default=True)
    p.add_argument("--lstm_pallas_train", type=_bool, default=True,
                   help="fused Pallas train kernels (custom-VJP fwd/bwd "
                   "scans): +31% train throughput at flagship dims. "
                   "Active on TPU bf16 when the per-device program is "
                   "explicit (single chip, or the shard_map train path); "
                   "falls back to the XLA scan elsewhere. Default-on "
                   "after passing the acceptance convergence bands "
                   "(scripts/acceptance_run.py) on the real chip.")
    p.add_argument("--faithful_quirks", type=_bool, default=True)
    p.add_argument("--model_parallelism", type=int, default=1,
                   help="size of the 'model' mesh axis (tensor parallelism)")
    p.add_argument("--sync_batch_norm", type=_bool, default=False,
                   help="synced (cross-shard) batch-norm moments under the "
                   "shard_map train path: DBoF gradients match the GSPMD "
                   "global-batch-statistics path exactly. Default: standard "
                   "unsynced data-parallel BN.")
    p.add_argument("--use_shardmap_train", type=_bool, default=False,
                   help="data-parallel train step via shard_map (explicit "
                   "per-device grads + one psum) instead of the GSPMD jit "
                   "path; requires model_parallelism=1")
    p.add_argument("--save_model_secs", type=int, default=30 * 60)
    p.add_argument("--save_summaries_secs", type=int, default=120,
                   help="cadence of the in-graph scalar + per-variable "
                   "histogram summaries (the reference Supervisor's "
                   "save_summaries_secs, train.py:503)")
    p.add_argument("--checkpoint_format", default="msgpack",
                   choices=["msgpack", "orbax"])
    p.add_argument("--async_checkpoint", type=_bool, default=True,
                   help="overlap periodic checkpoint writes with training "
                   "(on-device snapshot + background fetch/write; the "
                   "final save is always joined before exit). Multi-host: "
                   "msgpack writes async from the master; orbax writes "
                   "per-process shards async with its commit barrier on "
                   "the JAX coordination service, falling back to a "
                   "synchronous save (logged once) when that routing is "
                   "unavailable")
    p.add_argument("--use_native_io", type=_bool, default=True)
    p.add_argument("--deterministic_input", type=_bool, default=False,
                   help="make the multi-reader input pipeline yield the "
                   "single-reader batch stream exactly (round-robin file "
                   "dispatch + in-order drain; files still parse "
                   "concurrently) — reproducible runs at a small "
                   "throughput cost under skewed shard sizes")
    p.add_argument("--fetch_depth", type=int, default=4,
                   help="in-flight dispatch depth of the eval loops' "
                   "lag-N fetch ring (1 = sequential fetch); FIFO drain "
                   "keeps epoch metrics identical at any depth")
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    cfg_fields = TrainConfig.__dataclass_fields__
    kw = {k: v for k, v in vars(args).items() if k in cfg_fields}
    return TrainConfig(**kw)


def resolve_steps_per_dispatch(args: argparse.Namespace,
                               aggregated: bool = False,
                               process_count: int = 1,
                               logger: Optional[logging.Logger] = None) -> int:
    """Resolve --steps_per_dispatch 0 ("auto") and write the result back
    onto args.

    Auto rule (VERDICT r4 #3 — the fast path must be the default): K=24
    on a TPU backend for the single-process frame-level paths — the
    hardware K sweep measured 16→32.7k, 24→48.2k, 32→47.9k videos/s e2e
    (scripts/probe_stacked_eval_k.py), and the stacked program's epoch
    metrics are bit-identical to K=1 (tests/test_stacked_eval.py). K=1
    everywhere stacking is an edge case: aggregated readers (video-level
    batches are cheap; dispatch isn't the bottleneck), multi-host runs
    (per-process partial stacks interact with cross-host batch padding),
    and non-TPU backends (compile time of the K-scan dominates on CPU).
    An explicit --steps_per_dispatch >= 1 always wins. Negative values
    clamp to 1 (per-batch dispatch — the pre-auto behavior, and what
    cli.infer's max(1, ...) clamp still does); exactly 0 means auto."""
    k = getattr(args, "steps_per_dispatch", 1)
    if k < 0:
        k = 1
    if k == 0:
        import jax

        k = (
            24
            if (jax.default_backend() == "tpu" and not aggregated
                and process_count == 1)
            else 1
        )
        if logger is not None:
            logger.info("steps_per_dispatch auto-resolved to %d", k)
    args.steps_per_dispatch = k
    return k


def dump_flags(args: argparse.Namespace, logger: Optional[logging.Logger] = None):
    """The reference dumps all FLAGS at startup (train.py:705-707)."""
    log = (logger or logging.getLogger()).info
    for key in sorted(vars(args)):
        log("%s: %s", key, getattr(args, key))


def setup_logging():
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname)s:%(name)s:%(asctime)s: %(message)s",
    )


def param_names(params, prefix: str) -> List[str]:
    """Flattened parameter path list — the rebuild's version of the
    reference's trainable-variable name dump (train.py:326-328)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = []
    for path, leaf in flat:
        name = prefix + "/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        names.append(f"{name}:{list(leaf.shape)}")
    return names
