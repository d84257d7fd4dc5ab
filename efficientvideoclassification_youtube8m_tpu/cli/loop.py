"""The shared training driver loop for cli.train and cli.finetune.

One copy of the machinery both binaries need identically (they drifted
when duplicated — cli.finetune lost the KeyboardInterrupt save):
device_prefetch H2D double-buffering, one-step-lagged metric fetch (the
fetch of step N happens after step N+1 is dispatched, overlapping host
log work with device compute), master-broadcast summary/save cadences
(every host must enter collective saves at the same step), periodic +
final saves through the AsyncCheckpointSaver, and interrupt-safe
shutdown: Ctrl-C saves a final checkpoint, logs the pending step's
metrics (its step completed — only the fetch was outstanding), joins
the writer thread so the snapshot is on disk, and closes the writer.
"""

from __future__ import annotations

import time


def run_training_loop(*, loader, mesh, state, step_fn, saver, writer, cfg,
                      args, log_step, write_graph_summaries, logger):
    """Drive `step_fn` over the loader until the epoch limit or Ctrl-C.

    `log_step(metrics, host_labels, seconds_per_batch)` and
    `write_graph_summaries(metrics, global_step_val, state)` are the
    binary-specific pieces (which scalars/log line). Returns the final
    state."""
    import jax

    from efficientvideoclassification_youtube8m_tpu.parallel import (
        device_prefetch,
        distributed,
    )

    last_save = time.time()
    last_summary = time.time()
    pending = None  # (metrics, host_labels, batch_start_time)
    interrupted = False
    try:
        for (f, l, n), host_labels in device_prefetch(
                distributed.sync_host_streams(loader, "train"), mesh):
            batch_start_time = time.time()
            state, metrics = step_fn(state, f, l, n)
            if pending is not None:
                log_step(pending[0], pending[1],
                         batch_start_time - pending[2])
                # master decides cadences; broadcast keeps every host in
                # the same (collective) summary/save step
                if distributed.broadcast_flag(
                        time.time() - last_summary
                        > args.save_summaries_secs):
                    write_graph_summaries(
                        pending[0], int(pending[0]["global_step"]), state)
                    last_summary = time.time()
            pending = (metrics, host_labels, batch_start_time)
            if distributed.broadcast_flag(
                    time.time() - last_save > args.save_model_secs):
                # name the snapshot with the step stored IN the saved
                # state (the reference's Saver uses the graph's own
                # global_step, train.py:502) — not the lagged log step.
                # EVERY process calls save (multi-host saves coordinate
                # across processes); it writes master-only where needed.
                saver.save(cfg.train_dir, state,
                           int(jax.device_get(state.global_step)),
                           backend=args.checkpoint_format)
                last_save = time.time()
    except KeyboardInterrupt:
        interrupted = True
        logger.info("Interrupted; saving checkpoint.")
    if pending is not None:
        # the lagged metrics are logged even on interrupt: their step
        # completed, only its fetch was outstanding
        log_step(pending[0], pending[1], time.time() - pending[2])
    if not interrupted:
        logger.info("Done training -- epoch limit reached.")
    saver.save(cfg.train_dir, state,
               int(jax.device_get(state.global_step)),
               backend=args.checkpoint_format)
    saver.wait()  # the final snapshot must be on disk before exit
    writer.close()
    return state
