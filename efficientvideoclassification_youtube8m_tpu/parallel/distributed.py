"""Multi-host (multi-process) runtime helpers.

The reference's distribution story is a TF1 grpc parameter-server
scaffold keyed off TF_CONFIG (`train.py:654-733`) that its own authors
bypassed. The TPU-native replacement is single-controller-per-host SPMD:

  * `initialize()` — `jax.distributed.initialize` (coordinator address /
    process id from the environment, honoring the same TF_CONFIG shape
    for drop-in cluster specs);
  * `host_shard()` — which slice of the input shards this host reads
    (feeds FrameDataLoader's shard_index/num_shards);
  * global-batch assembly happens through `jax.make_array_from_
    process_local_data` on the data axis.

Fault tolerance follows the reference's model (SURVEY.md §5): periodic
checkpoints + relaunch-and-resume (`latest_checkpoint` ->
`restore_checkpoint`); there is no in-band elastic recovery to port.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax


def parse_tf_config(env: Optional[dict] = None) -> Optional[dict]:
    """Accept the reference's TF_CONFIG cluster spec (train.py:710-718)."""
    env = os.environ if env is None else env
    raw = env.get("TF_CONFIG")
    if not raw:
        return None
    cfg = json.loads(raw)
    cluster = cfg.get("cluster", {})
    task = cfg.get("task", {"type": "master", "index": 0})
    # master(s) first, then workers — process ids must be globally unique
    # across both job types (the reference's cluster spec has both,
    # train.py:710-718)
    masters = cluster.get("master", [])
    workers = cluster.get("worker", [])
    hosts = masters + workers
    index = int(task.get("index", 0))
    task_type = task.get("type", "master")
    process_id = index if task_type == "master" else len(masters) + index
    return {
        "coordinator": hosts[0] if hosts else None,
        "num_processes": len(hosts) or 1,
        "process_id": process_id,
        "task_type": task_type,
    }


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host runtime. No-ops for single-process runs.

    Falls back to TF_CONFIG (reference cluster-spec shape) and then to
    JAX's own env-based autodetection.
    """
    if coordinator_address is None:
        tfc = parse_tf_config()
        if tfc and tfc["num_processes"] > 1:
            coordinator_address = tfc["coordinator"]
            num_processes = tfc["num_processes"]
            process_id = tfc["process_id"]
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard() -> Tuple[int, int]:
    """(shard_index, num_shards) for this host's input pipeline."""
    return jax.process_index(), jax.process_count()


def is_master() -> bool:
    """The reference's master election (`train.py:444`)."""
    return jax.process_index() == 0
