"""Agent: the training runtime (folders, loop, checkpoints, guards,
summaries, profiling).

Rebuild of the reference ``Agent`` + ``MySession``
(``GeneralTools/graph_func.py:641-1219``) around the single jitted train
step:

- Orbax checkpointing of the full TrainState pytree (params, optimizer
  moments, SN power vectors, BN stats, loss moving averages, step, rng) —
  the exact variable coverage of tf.train.Saver in the reference
  (max_to_keep=2, graph_func.py:708-717); save at the end of each run
  chunk and on divergence (``abnormal_save``, :948-973).
- Divergence guards: NaN assert and loss>30000 early-stop (:856, :962),
  checked at host-sync points (every ``nan_check_step`` steps — the
  reference synced every step by construction; we keep the device queue
  deep for throughput and document the coarser guard granularity).
- Imbalanced update schedules: None (both every step), a [dis, gen]
  period list, or 'dynamic' probabilistic D updates (:876-942).
- Profiling: ``jax.profiler.trace`` window over the last 5 steps when
  ``do_trace`` (TimeLiner/chrome-trace equivalent, :578-603, :975-1141) —
  view with TensorBoard or Perfetto.
- ``debug_mode=None`` prints the model/op layout and returns without
  running (the reference's graph-inspection mode, :1195-1204).
"""

from __future__ import annotations

import os
import time
import warnings
from typing import Callable, Dict, Iterable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from mmdgan_tpu.parallel.mesh import DataParallel
from mmdgan_tpu.train.state import TrainState
from mmdgan_tpu.utils.folders import prepare_folder
from mmdgan_tpu.utils.summary import MetricWriter

LOSS_DIVERGENCE_BOUND = 30000.0  # graph_func.py:962


class _PreemptionGuard:
    """Scoped SIGTERM handler for training loops.

    TPU jobs get evicted with SIGTERM (spot/preemptible instances, pod
    maintenance). Inside the guard, SIGTERM sets ``requested`` instead of
    killing the process, so the loop can finish the in-flight step
    window, checkpoint, and return the TrainState cleanly — re-running
    with ``load_ckpt=True`` resumes bitwise (the reference could only
    checkpoint on NaN/divergence, graph_func.py:948-973; eviction lost
    up to a full 12.5k-step chunk).

    Installs only in the main thread (signals are main-thread-only);
    elsewhere it is a no-op and ``requested`` stays False. The previous
    handler is restored on exit, and re-raised-at-exit semantics are NOT
    used — callers decide what a clean stop means.
    """

    def __init__(self, enabled: bool = True):
        self.requested = False
        self._enabled = enabled
        self._prev = None
        self._installed = False

    def __enter__(self):
        import signal
        import threading

        if self._enabled and threading.current_thread() is threading.main_thread():
            def _handler(signum, frame):
                self.requested = True
                print("Agent: SIGTERM received — checkpointing at the "
                      "next step-window boundary.", flush=True)

            self._prev = signal.signal(signal.SIGTERM, _handler)
            self._installed = True
        return self

    def __exit__(self, *exc):
        if self._installed:
            import signal

            # signal.signal() returns None when the previous handler was
            # installed outside Python; restoring None raises TypeError
            signal.signal(signal.SIGTERM,
                          self._prev if self._prev is not None
                          else signal.SIG_DFL)
        return False


def _is_custom_sharded(tree) -> bool:
    """True when any leaf is sharded (not fully replicated) — the Agent
    loops then pin the step's output state layout (compile_step
    out_state_like) so XLA cannot re-replicate it."""
    return any(
        getattr(l, "sharding", None) is not None
        and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(tree))


def split_host_metrics(metrics_host: Dict, take_last: bool):
    """Split a ``device_get``'d step-metrics dict into (scalars, hists).

    ``hist/*`` keys carry [nbins] fixed-bin counts ([K, nbins] when
    scan-stacked — ``take_last`` picks the last step); everything else is
    a scalar (or [K] stack)."""
    scalars, hists = {}, {}
    for k, v in metrics_host.items():
        a = np.asarray(v)
        if k.startswith("hist/"):
            hists[k] = a[-1] if take_last else a
        else:
            scalars[k] = float(a[-1]) if take_last else float(a)
    return scalars, hists


class Agent:
    def __init__(
        self,
        filename: str,
        sub_folder: str,
        load_ckpt: bool = False,
        do_trace: bool = False,
        do_save: bool = True,
        debug_mode: Optional[bool] = False,
        debug_step: int = 400,
        query_step: int = 1000,
        imbalanced_update: Union[None, Sequence[int], str] = None,
        print_loss: bool = True,
        nan_check_step: int = 100,
        output_dir: Optional[str] = None,
        use_tensorboard: bool = True,
        max_to_keep: int = 2,
        param_hist_step: int = 0,
        handle_preemption: bool = True,
    ):
        """``param_hist_step``: write per-variable parameter histograms
        every N steps (the reference's tf.summary.histogram over all
        variables, my_sngan.py:309-313). Default 0 = off: fetching the
        full parameter tree through a tunneled host link costs ~0.1 s per
        query, a real tax at 400+ steps/s; grad/param norms and the loss
        internals remain always-on.

        ``handle_preemption``: treat SIGTERM as a graceful-stop request
        during training loops — finish the in-flight step window, save a
        checkpoint, return the TrainState (``_PreemptionGuard``). Re-run
        with ``load_ckpt=True`` to resume. False restores default signal
        semantics (process dies, losing work since the last save)."""
        self.filename = filename
        self.sub_folder = sub_folder
        self.load_ckpt = load_ckpt
        self.do_trace = do_trace
        self.do_save = do_save
        self.debug_mode = debug_mode
        self.debug_step = debug_step
        self.query_step = max(int(query_step), 1)
        self.imbalanced_update = imbalanced_update
        self.print_loss = print_loss
        self.nan_check_step = max(int(nan_check_step), 1)
        self.ckpt_folder, self.summary_folder, self.save_path = prepare_folder(
            filename, sub_folder=sub_folder, set_folder=output_dir
        )
        self.writer = MetricWriter(self.summary_folder, use_tensorboard=use_tensorboard)
        self._ckpt_mgr = None
        self._max_to_keep = max_to_keep
        self.param_hist_step = int(param_hist_step)
        self.handle_preemption = bool(handle_preemption)

    # ------------------------------------------------------------------
    # summaries
    # ------------------------------------------------------------------
    def _write_query(self, gstep: int, scalars: Dict, hists: Dict,
                     ts: Optional[TrainState] = None):
        """Write one query-step's summaries: scalars, the step's hist/*
        fixed-bin histograms, and (every ``param_hist_step``) per-variable
        parameter histograms."""
        from mmdgan_tpu.ops.losses import HIST_RANGES

        self.writer.scalars(gstep, scalars)
        for k, counts in hists.items():
            lo, hi = HIST_RANGES.get(k, (0.0, 1.0))
            self.writer.histogram(gstep, k, counts, lo, hi)
        # track the last written step explicitly: query writes land on
        # uneven steps (scan windows, final step), so a modular window
        # test can double-write or skip a period
        if (ts is not None and self.param_hist_step > 0
                and gstep - getattr(self, "_last_param_hist", -(1 << 62))
                >= self.param_hist_step):
            self._last_param_hist = gstep
            self.write_param_histograms(ts, gstep)

    def write_param_histograms(self, ts: TrainState, step: int):
        """Per-variable parameter histograms (my_sngan.py:309-313),
        computed host-side from the checkpointable state."""
        from jax.tree_util import tree_flatten_with_path, keystr

        leaves, _ = tree_flatten_with_path(ts.params)
        for path, leaf in leaves:
            tag = "params" + keystr(path).replace("'", "").replace(
                "][", "/").replace("[", "/").replace("]", "")
            self.writer.raw_histogram(step, tag, np.asarray(jax.device_get(leaf)))

    # ------------------------------------------------------------------
    # checkpointing (orbax)
    # ------------------------------------------------------------------
    def _ckpt_manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(self.ckpt_folder),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self._max_to_keep, create=True
                ),
            )
        return self._ckpt_mgr

    def save(self, ts: TrainState, step: Optional[int] = None):
        if not self.do_save:
            return
        import orbax.checkpoint as ocp

        step = int(ts.step) if step is None else int(step)
        mgr = self._ckpt_manager()
        mgr.save(step, args=ocp.args.StandardSave(ts))
        mgr.wait_until_finished()

    def restore(self, ts: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``ts`` (latest step by default).
        Returns ``ts`` unchanged if no checkpoint exists."""
        import orbax.checkpoint as ocp

        mgr = self._ckpt_manager()
        target = step if step is not None else mgr.latest_step()
        if target is None:
            print(f"Agent: no checkpoint found in {self.ckpt_folder}; "
                  "starting from scratch.")
            return ts
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, ts)
        restored = mgr.restore(target, args=ocp.args.StandardRestore(abstract))
        print(f"Agent: restored checkpoint at step {target} from {self.ckpt_folder}.")
        return restored

    # ------------------------------------------------------------------
    def _update_flags(self, global_step: int, mmd_average: float, rng: np.random.RandomState):
        """Decide (do_dis, do_gen) for this step (graph_func.py:850-942).

        The reference's op_list is [dis_op, gen_op] (my_sngan.py:426)."""
        iu = self.imbalanced_update
        if iu is None:
            return True, True
        if isinstance(iu, (list, tuple)):
            return global_step % iu[0] == 0, global_step % iu[1] == 0
        if iu == "dynamic":
            # probabilistic D update (graph_func.py:916-919)
            do_dis = (
                global_step < 1000
                or rng.uniform() < 0.1 / max(mmd_average, 0.1)
            )
            return bool(do_dis), True
        raise ValueError("Imbalanced_update not identified.")

    # ------------------------------------------------------------------
    def train(
        self,
        train_step: Callable,
        ts: TrainState,
        data_iter: Iterable[Dict],
        max_step: int,
        step_per_epoch: int,
        dp: Optional[DataParallel] = None,
        summary_image_fn: Optional[Callable] = None,
        model_description: Optional[str] = None,
        force_print: bool = False,
        steps_per_call: int = 1,
    ) -> TrainState:
        """Run the training loop; returns the final TrainState.

        :param train_step: from ``build_train_step`` (uncompiled)
        :param data_iter: yields host batches {'x': [B,H,W,C], 'y': ...}
        :param dp: DataParallel context (defaults to all devices)
        :param summary_image_fn: fn(ts) -> [N,H,W,C] images for the final
            summary (my_sngan.py:459-463)
        :param steps_per_call: fuse K steps per device launch via lax.scan
            (amortizes dispatch latency ~K-fold). Imbalanced schedules
            fuse too — they are computed on device inside the scan.
        """
        if (
            steps_per_call > 1
            and self.debug_mode is not None
        ):
            # imbalanced/list/dynamic schedules are computed ON DEVICE
            # inside the scan (build_imbalanced_multi_step), so every
            # schedule gets launch fusion
            return self._train_multi(
                train_step, ts, data_iter, max_step, step_per_epoch, dp,
                summary_image_fn, steps_per_call, force_print,
            )
        if self.debug_mode is None:
            # graph-inspection mode (graph_func.py:1195-1204)
            print(model_description or "Agent: debug_mode=None, nothing to run.")
            return ts
        if self.debug_mode:
            max_step = min(max_step, self.debug_step)

        dp = dp or DataParallel()
        ts = dp.ensure_placed(ts)
        step_fn = dp.compile_step(
            train_step,
            out_state_like=ts if _is_custom_sharded(ts) else None)
        if self.load_ckpt:
            ts = self.restore(ts)

        host_rng = np.random.RandomState(int(jax.device_get(ts.step)) + 12345)
        mmd_average = 0.0
        pending = []  # (step, metrics) awaiting host sync
        start = time.time()
        trace_started = False
        start_step = int(jax.device_get(ts.step))

        device_it = dp.prefetch(data_iter, size=2)
        with _PreemptionGuard(self.handle_preemption) as guard:
            for local_step in range(max_step):
                global_step = start_step + local_step
                batch = next(device_it)
                do_dis, do_gen = self._update_flags(global_step, mmd_average, host_rng)

                if (
                    self.do_trace
                    and not trace_started
                    and local_step == max_step - 5
                ):
                    jax.profiler.start_trace(os.path.join(self.summary_folder, "trace"))
                    trace_started = True

                ts, metrics = step_fn(
                    ts, batch, jnp.asarray(do_dis), jnp.asarray(do_gen)
                )
                pending.append((global_step + 1, metrics))

                sync_now = (
                    (global_step + 1) % self.nan_check_step == 0
                    or (global_step + 1) % self.query_step == 0
                    or local_step == max_step - 1
                    or self.imbalanced_update == "dynamic"
                )
                if sync_now:
                    for s, m in pending[-1:]:
                        vals, hists = split_host_metrics(
                            jax.device_get(m), take_last=False)
                        loss_vals = [vals["loss_gen"], vals["loss_dis"]]
                        mmd_average = 0.99 * mmd_average + 0.01 * vals["loss_gen"]
                        if any(np.isnan(loss_vals)):
                            self._abnormal_save(ts, s, vals)
                            raise FloatingPointError(
                                f"Model diverged with loss = {loss_vals} at step {s}"
                            )
                        if any(np.greater(loss_vals, LOSS_DIVERGENCE_BOUND)):
                            self._abnormal_save(ts, s, vals)
                            warnings.warn("Training stopped early as loss diverged.")
                            return ts
                        if (s % self.query_step == 0) or local_step == max_step - 1:
                            self._write_query(s, vals, hists, ts)
                            if self.print_loss or force_print:
                                epoch = (s - 1) // max(step_per_epoch, 1)
                                speed = (local_step + 1) / (time.time() - start)
                                print(
                                    f"global step {s} epoch {epoch}: "
                                    f"loss_gen {vals['loss_gen']:.4f} "
                                    f"loss_dis {vals['loss_dis']:.4f} "
                                    f"({speed:.2f} steps/s)"
                                )
                    pending.clear()
                if guard.requested:
                    break

        if trace_started:
            jax.device_get(ts.step)  # drain the queue before stopping trace
            jax.profiler.stop_trace()

        # save model + final image summary at last step (graph_func.py:869-874)
        final_step = int(jax.device_get(ts.step))
        if self.do_save:
            self.save(ts, final_step)
        if summary_image_fn is not None:
            imgs = np.asarray(jax.device_get(summary_image_fn(ts)))
            self.writer.images(final_step, "Ig", imgs)
        duration = time.time() - start
        print(f"Training for {max_step} steps took {duration:.3f} sec "
              f"({max_step / max(duration, 1e-9):.2f} steps/s).")
        self.writer.flush()
        return ts

    def _train_multi(
        self, train_step, ts, data_iter, max_step, step_per_epoch, dp,
        summary_image_fn, k, force_print,
    ) -> TrainState:
        """Scan-fused loop: K steps per launch (see build_multi_step)."""
        import jax.lax  # noqa: F401  (scan used inside the fused step)

        if self.debug_mode:
            max_step = min(max_step, self.debug_step)
        dp = dp or DataParallel()

        # cache the scan closure so per-chunk train() calls don't re-trace
        if not hasattr(self, "_multi_cache"):
            self._multi_cache = {}
        iu = self.imbalanced_update
        iu_key = tuple(iu) if isinstance(iu, (list, tuple)) else iu
        cache_key = (id(train_step), k, iu_key)
        if cache_key not in self._multi_cache:
            if iu is None:
                def multi(ts_in, batches, do_dis, do_gen):
                    def body(carry, batch):
                        return train_step(carry, batch, do_dis, do_gen)
                    return jax.lax.scan(body, ts_in, batches, length=k)
            else:
                from mmdgan_tpu.train.step import imbalanced_scan
                multi = imbalanced_scan(train_step, k, iu)
            self._multi_cache[cache_key] = multi
        ts = dp.ensure_placed(ts)
        step_fn = dp.compile_step(
            self._multi_cache[cache_key],
            out_state_like=ts if _is_custom_sharded(ts) else None)
        if self.load_ckpt:
            ts = self.restore(ts)
        start_step = int(jax.device_get(ts.step))
        start = time.time()
        data_it = iter(data_iter)
        num_calls = max_step // k
        remainder = max_step - num_calls * k
        t_true = jnp.asarray(True)
        # carried device-side schedule state (imbalanced modes); the
        # average resets per train() call like the reference's full_run
        sched_rng = jax.random.PRNGKey(start_step + 98765)
        mmd_avg = jnp.zeros(())

        def stacked_host_batches():
            while True:
                host = [next(data_it) for _ in range(k)]
                yield {
                    key: (np.stack([b[key] for b in host])
                          if host[0].get(key) is not None else None)
                    for key in host[0]
                }

        device_it = dp.prefetch(stacked_host_batches(), size=2, multi=True)
        with _PreemptionGuard(self.handle_preemption) as guard:
            for call in range(num_calls):
                batches = next(device_it)
                if iu is None:
                    ts, metrics = step_fn(ts, batches, t_true, t_true)
                else:
                    ts, sched_rng, mmd_avg, metrics = step_fn(
                        ts, batches, sched_rng, mmd_avg)
                gstep = start_step + (call + 1) * k
                if (
                    gstep % self.query_step < k
                    or gstep // self.nan_check_step != (gstep - k) // self.nan_check_step
                    or call == num_calls - 1
                ):
                    vals, hists = split_host_metrics(
                        jax.device_get(metrics), take_last=True)
                    loss_vals = [vals["loss_gen"], vals["loss_dis"]]
                    if any(np.isnan(loss_vals)):
                        self._abnormal_save(ts, gstep, vals)
                        raise FloatingPointError(
                            f"Model diverged with loss = {loss_vals} at step {gstep}")
                    if any(np.greater(loss_vals, LOSS_DIVERGENCE_BOUND)):
                        self._abnormal_save(ts, gstep, vals)
                        warnings.warn("Training stopped early as loss diverged.")
                        return ts
                    if gstep % self.query_step < k or call == num_calls - 1:
                        self._write_query(gstep, vals, hists, ts)
                        if self.print_loss or force_print:
                            epoch = (gstep - 1) // max(step_per_epoch, 1)
                            speed = (call + 1) * k / (time.time() - start)
                            print(f"global step {gstep} epoch {epoch}: "
                                  f"loss_gen {vals['loss_gen']:.4f} "
                                  f"loss_dis {vals['loss_dis']:.4f} "
                                  f"({speed:.2f} steps/s)")
                if guard.requested:
                    break
        # trailing steps below one scan window run singly. Source them
        # from the stacked device iterator, NOT next(data_it): the
        # prefetch producer thread shares that generator and a direct
        # pull here would race it ("generator already executing").
        if remainder and not guard.requested:
            single = dp.compile_step(train_step)
            host_rng = np.random.RandomState(start_step + 12345)
            for i in range(remainder):
                if i % k == 0:
                    batches = next(device_it)
                batch = {key: (None if v is None else v[i % k])
                         for key, v in batches.items()}
                if iu is None:
                    dd, dg = t_true, t_true
                else:
                    dd, dg = self._update_flags(
                        start_step + num_calls * k + i,
                        float(jax.device_get(mmd_avg)), host_rng)
                    dd, dg = jnp.asarray(dd), jnp.asarray(dg)
                ts, metrics = single(ts, batch, dd, dg)
            jax.device_get(metrics["loss_gen"])

        final_step = int(jax.device_get(ts.step))
        if self.do_save:
            self.save(ts, final_step)
        if summary_image_fn is not None:
            imgs = np.asarray(jax.device_get(summary_image_fn(ts)))
            self.writer.images(final_step, "Ig", imgs)
        duration = time.time() - start
        print(f"Training for {max_step} steps took {duration:.3f} sec "
              f"({max_step / max(duration, 1e-9):.2f} steps/s).")
        self.writer.flush()
        return ts

    def train_device_data(
        self,
        model,
        opt_dis,
        opt_gen,
        ts: TrainState,
        data: dict,
        max_step: int,
        step_per_epoch: int,
        batch_size: int,
        steps_per_call: int = 16,
        summary_image_fn=None,
        force_print: bool = False,
        seed: int = 0,
        sample_same_class: bool = False,
        dp: Optional[DataParallel] = None,
        sampling: str = "uniform",
        sampling_seed: Optional[int] = None,
        micro_batches: int = 1,
    ) -> TrainState:
        """Training loop over an HBM-resident dataset: ``data`` ({'x':
        [N,H,W,C] uint8 or f32, 'y': [N,1] or None}, e.g. from
        ``ReadTFRecords.load_all``) is uploaded ONCE; batches are sampled
        on device inside the scanned step (``build_device_data_step``) —
        zero per-step host->device data transfer. On a tunneled chip this
        is ~6.6x faster than host-fed f32 batches (CIFAR b64: 62 -> 409
        steps/s). ``sample_same_class`` draws each batch from one class
        (group_by_window semantics; needs labels in ``data['y']``). Same
        NaN/divergence guards, summaries and checkpointing as ``train``.

        ``dp``: a multi-device ``DataParallel`` shards the dataset over
        the mesh (each chip stores N/D rows and samples locally via
        shard_map; same-class batching uses per-device class tables with
        one global class draw — train/step.py). Dataset rows are trimmed
        to a multiple of the per-process device count. ``ts`` should be
        replicated (a host-local state is replicated here). Under
        multi-process SPMD ``data`` holds this process's LOCAL rows
        (assembled globally via make_array_from_process_local_data, like
        ``shard_batch``); ``sample_same_class`` works there too — each
        process builds class tables over its OWN local shards (local row
        indices, width pinned so tiles agree) and the global class draw
        is shared (un-folded key / shared schedule), so no cross-host
        label exchange is needed.

        ``sampling``: ``"uniform"`` (default; with-replacement random
        gather) or ``"shuffled_epochs"`` — without-replacement epochs via
        contiguous slices of the dataset, re-permuted here at every epoch
        boundary (one HBM-local gather per epoch). Measured on a v5e
        chip the slice sampler removes the whole random-gather cost:
        CIFAR b64 412 -> 459 steps/s, i.e. real-data training at
        synthetic-feed parity (tools/hbm_study.py; epoch semantics also
        match the reference's shuffled-epoch pipeline more closely than
        with-replacement). Permutations derive from ``sampling_seed``
        (default: ``seed``) and the epoch number, so checkpoint resume
        replays them bitwise — chunked callers that vary ``seed`` per
        chunk (for distinct noise streams) must pass a FIXED
        ``sampling_seed`` or an epoch straddling a chunk boundary
        switches permutation families mid-epoch and loses the
        without-replacement guarantee. A
        boundary crossed mid-launch keeps the previous permutation for
        the rest of that K-step window (still a far stronger shuffle
        than the reference's 10k-element buffer). The unconditional
        sampler is single-process only. Combined with
        ``sample_same_class`` the group_by_window semantics ride a
        deterministic class schedule (one global class draw per step,
        ``class_schedule``) with per-class without-replacement epoch
        streams permuted ON DEVICE from (sampling_seed, class,
        class_epoch) — no EpochPermuter, works sharded and
        multi-process, and resume replays the identical streams."""
        from mmdgan_tpu.train.step import (
            EpochPermuter, build_device_data_step, same_class_tables,
            sharded_same_class_tables)

        if self.debug_mode is None:
            print("Agent: debug_mode=None, nothing to run.")
            return ts
        if self.debug_mode:
            max_step = min(max_step, self.debug_step)
        k = steps_per_call
        if not hasattr(self, "_devdata_cache"):
            self._devdata_cache = {}

        ndev = 1 if dp is None else dp.num_devices
        nproc = 1 if dp is None else dp.process_count
        assert dp is None or dp.model_axis is None, (
            "HBM-resident datasets are data-parallel only (the shard_map "
            "sampler shards rows over the data axis); use a 1-D mesh")
        shuffled = sampling == "shuffled_epochs"
        scheduled = shuffled and sample_same_class
        if sampling_seed is None:
            sampling_seed = seed
        if shuffled and not sample_same_class:
            assert nproc == 1, (
                "sampling='shuffled_epochs' (unconditional) is "
                "single-process through this facade (epoch "
                "re-permutation needs every process to hold its rows); "
                "drive build_device_data_step yourself for "
                "multi-process epoch shuffles")
        host_x = np.asarray(data["x"])
        host_y = None if data.get("y") is None else np.asarray(data["y"])
        local_dev = ndev // nproc
        if local_dev > 1 and host_x.shape[0] % local_dev:
            keep = host_x.shape[0] - host_x.shape[0] % local_dev
            warnings.warn(
                f"trimming HBM dataset {host_x.shape[0]} -> {keep} rows "
                f"to divide over {local_dev} local devices")
            host_x = host_x[:keep]
            host_y = None if host_y is None else host_y[:keep]

        table = counts = None
        table_key = None
        if sample_same_class:
            assert host_y is not None, (
                "sample_same_class needs labels in data['y']")
            if nproc > 1:
                # each process builds tables for ITS OWN local shards
                # (local row indices, width pinned to local_n so every
                # process's tiles agree), then assembles the global
                # [ndev, num_class, width] arrays exactly like the
                # dataset rows — same_class over a multi-process mesh
                # needs no cross-host label exchange, because the class
                # draw is global (un-folded key / shared schedule) and
                # each device samples its LOCAL rows
                from jax.sharding import NamedSharding, PartitionSpec as P

                local_n = host_x.shape[0] // local_dev
                t_loc, c_loc = sharded_same_class_tables(
                    host_y, model.num_class, local_dev, width=local_n)
                if scheduled:
                    assert int(c_loc.min()) >= batch_size // ndev, (
                        f"same_class + shuffled_epochs needs every class "
                        f">= batch/D = {batch_size // ndev} rows on every "
                        f"local shard; min {int(c_loc.min())}")
                table_key = (t_loc.tobytes(), c_loc.tobytes())
                tsh = NamedSharding(dp.mesh, P(dp.axis))
                table = jax.make_array_from_process_local_data(
                    tsh, t_loc, (ndev,) + t_loc.shape[1:])
                counts = jax.make_array_from_process_local_data(
                    tsh, c_loc, (ndev, model.num_class))
            elif ndev > 1:
                table, counts = sharded_same_class_tables(
                    host_y, model.num_class, ndev)
            else:
                table, counts = same_class_tables(host_y, model.num_class)

        def get_fn(num_steps):
            # the jitted step CLOSES OVER the class tables and the mesh —
            # both must be part of the key or a second call with a
            # different dataset/mesh would silently reuse stale closures
            tkey = table_key
            if tkey is None and table is not None:
                tkey = (table.tobytes(), counts.tobytes())
            mesh_key = None if dp is None else id(dp.mesh)
            cache_key = (id(model), id(opt_dis), id(opt_gen), num_steps,
                         batch_size, sample_same_class, ndev, tkey,
                         mesh_key, sampling,
                         sampling_seed if scheduled else None,
                         micro_batches)
            if cache_key not in self._devdata_cache:
                builder = build_device_data_step(
                    model, opt_dis, opt_gen, num_steps, batch_size,
                    same_class=sample_same_class,
                    class_table=table, class_counts=counts,
                    sampling=sampling, sampler_seed=sampling_seed,
                    micro_batches=micro_batches)
                if ndev > 1:
                    builder = builder.with_mesh(dp.mesh, axis=dp.axis)
                self._devdata_cache[cache_key] = jax.jit(builder)
            return self._devdata_cache[cache_key]

        fn = get_fn(k)
        if self.load_ckpt:
            ts = self.restore(ts)
        if ndev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(dp.mesh, P(dp.axis))
            if nproc > 1:
                # device_put cannot address other hosts' devices; the
                # global array is assembled from each process's local
                # rows (docs/multihost.md, like shard_batch)
                gshape = (host_x.shape[0] * nproc,) + host_x.shape[1:]
                data_x = jax.make_array_from_process_local_data(
                    batch_sh, host_x, gshape)
                data_y = None
                if host_y is not None:
                    gy = (host_y.shape[0] * nproc,) + host_y.shape[1:]
                    data_y = jax.make_array_from_process_local_data(
                        batch_sh, host_y, gy)
            else:
                data_x = jax.device_put(host_x, batch_sh)
                data_y = None if host_y is None else jax.device_put(
                    host_y, batch_sh)
            ts = dp.ensure_placed(ts)
        else:
            data_x = jax.device_put(host_x)
            data_y = None if host_y is None else jax.device_put(host_y)
        rng = jax.random.PRNGKey(seed + 54321)
        t_true = jnp.ones(())
        start_step = int(jax.device_get(ts.step))
        start = time.time()

        if shuffled and not scheduled:
            # Epoch re-permutation for sampling='shuffled_epochs'. The
            # layout for epoch e is orig[perm(e)] with perm(e) derived
            # from (sampling_seed, e) alone — directly computable, so a
            # resumed run replays the identical shuffles (no cumulative
            # state). Applied incrementally as
            # delta = inv(perm(prev)) o perm(e): one HBM-local take per
            # epoch, no extra dataset copy held.
            if ndev > 1:
                ln = host_x.shape[0] // ndev
                n_batches = ln // (batch_size // ndev)
                permuter = EpochPermuter.sharded(
                    ln, ndev, sampling_seed, dp.mesh, dp.axis)
            else:
                n_batches = host_x.shape[0] // batch_size
                permuter = EpochPermuter.single_device(
                    host_x.shape[0], sampling_seed)
            assert n_batches >= 1, (host_x.shape[0], batch_size)

            # resume mid-protocol: jump straight to this epoch's layout
            data_x, data_y = permuter.advance(
                start_step // n_batches, [data_x, data_y])

        if max_step < k:
            k = max_step
            fn = get_fn(k)
        num_calls = max_step // k
        remainder = max_step - num_calls * k

        full_sched = None
        if scheduled:
            # one global class draw per step + per-class running draw
            # counts, regenerated deterministically from sampling_seed —
            # a resumed run's schedule continues the per-class streams
            # exactly (train/step.py class_schedule)
            from mmdgan_tpu.train.step import class_schedule

            full_sched = class_schedule(
                model.num_class, start_step + max_step, sampling_seed)

        # multi-process same-class tables span non-addressable devices —
        # jit can't close over them, so the step takes them as trailing
        # arguments (build_device_data_step tables_global)
        targs = ((table, counts)
                 if sample_same_class and isinstance(table, jax.Array)
                 else ())

        def _invoke(fn_, ts, rng, off, n):
            if scheduled:
                return fn_(ts, data_x, data_y, rng, t_true, t_true,
                           full_sched[off:off + n], *targs)
            return fn_(ts, data_x, data_y, rng, t_true, t_true, *targs)

        with _PreemptionGuard(self.handle_preemption) as guard:
            for call in range(num_calls):
                if shuffled and not scheduled:
                    data_x, data_y = permuter.advance(
                        (start_step + call * k) // n_batches, [data_x, data_y])
                ts, rng, metrics = _invoke(
                    fn, ts, rng, start_step + call * k, k)
                gstep = start_step + (call + 1) * k
                if (
                    gstep % self.query_step < k
                    or gstep // self.nan_check_step != (gstep - k) // self.nan_check_step
                    or call == num_calls - 1
                ):
                    vals, hists = split_host_metrics(
                        jax.device_get(metrics), take_last=True)
                    loss_vals = [vals["loss_gen"], vals["loss_dis"]]
                    if any(np.isnan(loss_vals)):
                        self._abnormal_save(ts, gstep, vals)
                        raise FloatingPointError(
                            f"Model diverged with loss = {loss_vals} at step {gstep}")
                    if any(np.greater(loss_vals, LOSS_DIVERGENCE_BOUND)):
                        self._abnormal_save(ts, gstep, vals)
                        warnings.warn("Training stopped early as loss diverged.")
                        return ts
                    if gstep % self.query_step < k or call == num_calls - 1:
                        self._write_query(gstep, vals, hists, ts)
                        if self.print_loss or force_print:
                            epoch = (gstep - 1) // max(step_per_epoch, 1)
                            speed = (call + 1) * k / (time.time() - start)
                            print(f"global step {gstep} epoch {epoch}: "
                                  f"loss_gen {vals['loss_gen']:.4f} "
                                  f"loss_dis {vals['loss_dis']:.4f} "
                                  f"({speed:.2f} steps/s)")
                if guard.requested:
                    break
        if remainder and not guard.requested:
            if shuffled and not scheduled:
                data_x, data_y = permuter.advance(
                    (start_step + num_calls * k) // n_batches,
                    [data_x, data_y])
            ts, rng, metrics = _invoke(
                get_fn(remainder), ts, rng,
                start_step + num_calls * k, remainder)
            jax.device_get(metrics["loss_gen"])
        final_step = int(jax.device_get(ts.step))
        if self.do_save:
            self.save(ts, final_step)
        if summary_image_fn is not None:
            imgs = np.asarray(jax.device_get(summary_image_fn(ts)))
            self.writer.images(final_step, "Ig", imgs)
        duration = time.time() - start
        ran = num_calls * k + remainder
        print(f"Training for {ran} steps took {duration:.3f} sec "
              f"({ran / max(duration, 1e-9):.2f} steps/s).")
        self.writer.flush()
        return ts

    def _abnormal_save(self, ts, step, vals):
        """Checkpoint on divergence (graph_func.py:948-973)."""
        if self.do_save:
            try:
                self.save(ts, step)
            except Exception as e:  # keep the original error primary
                warnings.warn(f"abnormal_save failed: {e}")
        warnings.warn(f"Abnormal state at step {step}: {vals}")
