"""Evaluation runtime: checkpoint polling, prediction dumps, metrics, AP.

Behavioral twin of the reference evaluator
(ref: src/monopsr/core/evaluator.py:18-564): builds the eval step once;
per checkpoint restores weights (EMA-preferred, like the reference's
moving-average swapping saver), iterates one dataset epoch, saves
predictions + losses/metrics CSVs, converts to KITTI format, and runs
the native C++ evaluator; a polling loop with an `evaluated_<split>.txt`
ledger skips finished checkpoints.

TPU-first differences: losses + metrics + outputs come from one jitted
XLA program per sample; the native AP evaluation runs in a worker
process like the reference fork (ref: evaluator.py:528-564).
"""

import json
import multiprocessing
import os
import subprocess
import sys
import time

import jax
import numpy as np

import monopsr_tpu
from monopsr_tpu import constants as C
from monopsr_tpu.eval import kitti_writers, pipeline, predictions
from monopsr_tpu.models import monopsr
from monopsr_tpu.parallel import mesh as mesh_lib
from monopsr_tpu.train import optimizer as opt_lib
from monopsr_tpu.train import trainer as trainer_lib
from monopsr_tpu.train.train_state import TrainState
from monopsr_tpu.utils import prefetch


class Evaluator:

    def __init__(self, config, dataset, eval_mode,
                 skip_evaluated_checkpoints=True,
                 eval_wait_interval=30,
                 do_kitti_native_eval=True,
                 use_ema_weights=True):
        if eval_mode not in ('val', 'test'):
            raise ValueError('Invalid eval_mode: ' + str(eval_mode))

        self.config = config
        self.dataset = dataset
        self.eval_mode = eval_mode
        self.skip_evaluated_checkpoints = skip_evaluated_checkpoints
        self.eval_wait_interval = eval_wait_interval
        self.do_kitti_native_eval = do_kitti_native_eval
        self.use_ema_weights = use_ema_weights
        # Data-parallel evaluation: shard each vmapped dispatch's image
        # axis over a 'data' mesh (embarrassingly parallel — no
        # collectives; params replicated). Inherits train_config.
        # data_parallel unless eval_data_parallel overrides.
        dp = int(config.train_config.get(
            'eval_data_parallel',
            config.train_config.get('data_parallel', 1)) or 1)
        self._mesh = mesh_lib.create_mesh(min(dp, len(jax.devices())))
        n_dev = self._mesh.devices.size

        # Samples per vmapped eval dispatch (one compile; tails padded;
        # rounded up to fill every mesh device)
        eval_batch = max(1, int(
            config.train_config.get('eval_batch', 4) or 4))
        self.eval_batch = -(-eval_batch // n_dev) * n_dev
        # Samples pulled per packed device->host transfer (the tunnel's
        # per-transfer latency dominates; batching amortizes it).
        # Internally counted in dispatch groups of eval_batch samples.
        pull_samples = int(
            config.train_config.get('eval_pull_batch', 8) or 8)
        self.pull_batch = max(1, pull_samples // self.eval_batch)
        # Host assembly worker threads (KITTI IO / merge / resize)
        self.producer_threads = max(1, int(
            config.train_config.get('eval_producer_threads', 2) or 2))
        # Per-box-slot truncation buckets for device->host pulls; the
        # full num_boxes bucket is always present as the fallback.
        buckets = config.train_config.get('eval_slot_buckets', (8, 16))

        model_config = config.model_config
        dataset_config = config.dataset_config

        self.net, self.cfg = monopsr.create_net(model_config,
                                                dataset_config)
        self._slot_buckets = sorted(
            {int(b) for b in (buckets or ())
             if 0 < int(b) < self.cfg.num_boxes} | {self.cfg.num_boxes})
        self.loss_config = model_config.loss_config.to_dict()
        self.post_process_cen_x = bool(
            model_config.get('post_process_cen_x', True))
        self.metrics_to_show = [
            tuple(entry) for entry in
            (model_config.get('metrics_to_show') or [])]
        self.score_threshold = float(
            config.train_config.get('kitti_score_threshold', 0.1))

        tx, _, use_ema, _ = opt_lib.build_optimizer(config.train_config)
        self._tx = tx
        self._use_ema = use_ema

        self._eval_step = self._build_eval_step()
        self._template_state = None

        # Ledger of evaluated checkpoints
        os.makedirs(config.exp_output_dir, exist_ok=True)
        self.ledger_path = os.path.join(
            config.exp_output_dir,
            'evaluated_{}.txt'.format(dataset.data_split))

        # Native eval availability
        self.native_eval_dir = os.path.join(
            monopsr_tpu.scripts_dir(), 'offline_eval', 'kitti_native_eval')

        self._tb = None
        self._tensorboard = bool(
            config.train_config.get('tensorboard', True))

    def _tb_writer(self):
        """Lazy TB event writer under logdir/<split> (one per run)."""
        if self._tb is None:
            from monopsr_tpu.utils import tb_events
            self._tb = tb_events.TBWriter(
                os.path.join(self.config.logdir,
                             self.dataset.data_split),
                enabled=self._tensorboard)
        return self._tb

    # -- jitted step -------------------------------------------------------

    def _build_eval_step(self):
        net, cfg, loss_config = self.net, self.cfg, self.loss_config
        compute_losses = self.eval_mode == 'val'

        # The forward runs the net's batch-native path (the vmapped
        # alternative measures ~1.7x slower on the towers,
        # scripts/diag_forward_bisect.py); GT/losses/packing stay
        # vmapped per sample. max_slots is static (one compile per slot
        # bucket): per-box outputs are truncated on device to the
        # group's bucket so padding slots never cross the link.
        def eval_step(variables, batch, max_slots):
            outputs = net.apply(
                variables, **monopsr.net_inputs_from_batch(batch),
                train=False)

            def per_sample(sample, sample_outputs):
                if not compute_losses:
                    return (monopsr.pack_outputs_for_host(
                        sample_outputs, cfg.num_boxes, max_slots),
                        {}, {})
                gt = monopsr.build_gt_dict(cfg, sample, sample_outputs)
                sample_outputs, gt = monopsr.add_global_outputs(
                    cfg, sample, sample_outputs, gt)
                losses, _ = monopsr.compute_losses(
                    cfg, loss_config, sample_outputs, gt)
                metrics = monopsr.slice_box_slots(
                    monopsr.compute_metrics(cfg, sample_outputs, gt),
                    cfg.num_boxes, max_slots)
                return (monopsr.pack_outputs_for_host(
                    sample_outputs, cfg.num_boxes, max_slots),
                    losses, metrics)

            return jax.vmap(per_sample)(batch, outputs)

        return jax.jit(eval_step, static_argnums=2)

    def _slot_bucket(self, samples):
        return pipeline.slot_bucket(samples, self._slot_buckets,
                                    self.cfg.num_boxes)

    # -- checkpoint management ----------------------------------------------

    def _get_template_state(self, sample):
        if self._template_state is None:
            variables = jax.jit(lambda s: self.net.init(
                jax.random.PRNGKey(0),
                **monopsr.net_inputs_from_batch(s), train=False))(sample)
            self._template_state = jax.jit(
                lambda v: TrainState.create(
                    v, self._tx, use_ema=self._use_ema))(variables)
        return self._template_state

    def restore_checkpoint(self, manager, step, sample):
        import orbax.checkpoint as ocp
        template = self._get_template_state(sample)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            template)
        return manager.restore(step,
                               args=ocp.args.StandardRestore(abstract))

    def get_evaluated_ckpts(self):
        if not os.path.exists(self.ledger_path):
            return set()
        with open(self.ledger_path) as f:
            return {int(line) for line in f.read().split() if line}

    def _mark_evaluated(self, step):
        with open(self.ledger_path, 'a') as f:
            f.write('{}\n'.format(int(step)))

    # -- single-checkpoint evaluation -------------------------------------

    def _output_dirs(self, global_step):
        base = self.config.pred_dir
        split = self.dataset.data_split
        dirs = {
            C.OUT_DIR_BOX_3D: os.path.join(
                base, 'box_3d', split, str(global_step)),
            C.OUT_DIR_BOX_2D: os.path.join(
                base, 'box_2d', split, str(global_step)),
            C.OUT_DIR_XYZ_MAP_LOCAL: os.path.join(
                base, 'xyz_map_local', split, str(global_step)),
        }
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
        return dirs

    def run_checkpoint_once(self, state, global_step):
        """Evaluates one checkpoint over a full dataset epoch."""
        dataset = self.dataset
        # Restored checkpoints are host arrays; pin them on the mesh once
        # (replicated) so every eval call doesn't re-upload the tree.
        variables = mesh_lib.replicate(
            self._mesh,
            state.eval_variables(use_ema=self.use_ema_weights))
        output_dirs = self._output_dirs(global_step)

        loss_sums, loss_counts = {}, {}
        metric_values = {}
        feed_times, infer_times = [], []

        num_evaluated = 0
        dataset._index_in_epoch = 0
        dataset.epochs_completed = 0

        def process(sample, step_out):
            """Aggregates, formats, and saves one pulled result."""
            nonlocal num_evaluated
            outputs, losses, metrics = step_out

            num_objs = int(sample[C.SAMPLE_NUM_OBJS])

            # Aggregate losses (NaN-filtered like the reference :276)
            for name, value in losses.items():
                v = float(value)
                if np.isfinite(v):
                    loss_sums[name] = loss_sums.get(name, 0.0) + v
                    loss_counts[name] = loss_counts.get(name, 0) + 1

            # Aggregate per-box metrics over valid slots
            for name, value in metrics.items():
                arr = np.asarray(value)[0:num_objs]
                metric_values.setdefault(name, []).append(arr.ravel())

            pred_dict = predictions.format_predictions(
                self.cfg, outputs, sample, dataset, self.eval_mode,
                post_process_cen_x=self.post_process_cen_x)
            predictions.save_predictions(
                pred_dict, sample[C.SAMPLE_NAME], output_dirs)
            num_evaluated += 1

        # Software pipeline over the host<->device link: the main loop
        # assembles samples and dispatches vmapped eval_batch-sample
        # device steps; completed step outputs are pulled several
        # dispatches at a time in ONE packed transfer (amortizing the
        # tunnel's per-transfer latency), in a background thread so
        # formatting/saving overlaps the next batch's device compute
        # and transfer.
        def process_group(group, batched_out):
            samples = group
            for i, sample in enumerate(samples):
                single = jax.tree.map(lambda x: x[i], batched_out)
                process(sample, single)

        eval_batch = self.eval_batch
        pipe = pipeline.BatchedPullPipeline(
            process_group, pull_batch=self.pull_batch,
            on_pull_time=lambda dt, n: infer_times.extend(
                [dt / eval_batch] * (n * eval_batch)))

        group_samples, group_device = [], []

        def dispatch_group():
            real = len(group_device)
            padded = group_device + [group_device[-1]] * (
                eval_batch - real)
            batch = trainer_lib.stack_samples(padded)
            if self._mesh.devices.size > 1:
                # Explicit leading-axis sharding; on a 1-device mesh the
                # jit call's own arg transfer is fewer round trips.
                batch = mesh_lib.shard_batch(self._mesh, batch)
            # Pad rows ride along in the transfer (no extra dispatches);
            # process_group only iterates the real samples. Per-box
            # outputs are truncated on device to the group's slot
            # bucket before the pull.
            bucket = self._slot_bucket(group_samples)
            pipe.add(list(group_samples),
                     self._eval_step(variables, batch, bucket))

        # Ordered producer pool: sample assembly (KITTI IO, MSCNN
        # merge, resize, encode) overlaps device dispatch, transfer,
        # and the pull worker's formatting.
        def assemble(idx):
            t0 = time.time()
            sample = dataset.get_sample_dict([idx])[0]
            if sample is None:
                return None
            device_sample = trainer_lib.prepare_sample(
                sample, self.cfg.image_input_shape)
            if self.eval_mode == 'test':
                # Inference needs no GT arrays on device; skip
                # shipping the depth map / instance image (over
                # half the bytes)
                device_sample = monopsr.strip_to_net_inputs(
                    device_sample)
            feed_times.append(time.time() - t0)
            return sample, device_sample

        for item in prefetch.ordered_prefetch(
                assemble, range(dataset.num_samples),
                num_threads=self.producer_threads):
            if item is None:
                continue
            sample, device_sample = item
            group_samples.append(sample)
            group_device.append(device_sample)
            if len(group_device) == eval_batch:
                dispatch_group()
                group_samples, group_device = [], []
        if group_device:
            dispatch_group()
        pipe.close()

        print('Evaluated {} samples at step {}'.format(
            num_evaluated, global_step))
        kitti_writers.print_inference_time_statistics(
            feed_times, infer_times)

        results = {'step': int(global_step),
                   'num_samples': num_evaluated}

        if self.eval_mode == 'val':
            avg_losses = {name: loss_sums[name] / max(loss_counts[name], 1)
                          for name in loss_sums}
            results['losses'] = avg_losses

            metrics_flat = {name: np.concatenate(vals)
                            for name, vals in metric_values.items()}
            metrics_dir = os.path.join(self.config.exp_output_dir,
                                       'metrics')
            kitti_writers.save_metrics(
                metrics_dir, global_step, dataset.data_split,
                metrics_flat)
            results['metrics'] = {
                name: float(np.mean(v[np.isfinite(v)]))
                if np.isfinite(v).any() else float('nan')
                for name, v in metrics_flat.items()}
            # Signed means cancel across samples (a +2 m and a -2 m
            # cen_z error average to 0); expose the mean magnitude too
            # so downstream gates can bound the actual per-sample error
            # (same statistic as the CSVs' avg_abs column,
            # ref: evaluator_utils.py:294-403)
            results['metrics_abs'] = {
                name: float(np.mean(np.abs(v[np.isfinite(v)])))
                if np.isfinite(v).any() else float('nan')
                for name, v in metrics_flat.items()}

            # Print the configured subset (the reference mirrors
            # metrics_to_show to TensorBoard, ref: evaluator_utils.py:294+)
            for name, stat in self.metrics_to_show:
                values = metrics_flat.get(name)
                if values is None:
                    continue
                values = values[np.isfinite(values)]
                if not len(values):
                    continue
                if stat == 'avg':
                    value = float(np.mean(values))
                elif stat == 'std':
                    value = float(np.std(values))
                elif stat == 'avg_abs':
                    value = float(np.mean(np.abs(values)))
                elif stat == 'std_abs':
                    value = float(np.std(np.abs(values)))
                else:
                    continue
                print('  {} ({}): {:.4f}'.format(name, stat, value))

        # Write eval scalar log
        log_path = os.path.join(self.config.logdir,
                                'eval_{}.jsonl'.format(dataset.data_split))
        os.makedirs(self.config.logdir, exist_ok=True)
        with open(log_path, 'a') as f:
            f.write(json.dumps(results, default=float) + '\n')

        # Mirror eval scalars to TensorBoard (the reference writes eval
        # losses + the metrics_to_show subset as TB scalars under
        # logdir/<split>, ref: evaluator_utils.py:294-403, :406-434)
        tb_scalars = {}
        for name, value in (results.get('losses') or {}).items():
            tb_scalars['losses/' + name] = value
        for name, stat in self.metrics_to_show:
            values = metric_values.get(name)
            if not values:
                continue
            flat = np.concatenate(values)
            flat = flat[np.isfinite(flat)]
            if not len(flat):
                continue
            fn = {'avg': np.mean, 'std': np.std,
                  'avg_abs': lambda v: np.mean(np.abs(v)),
                  'std_abs': lambda v: np.std(np.abs(v))}.get(stat)
            if fn is not None:
                tb_scalars['metrics/{}_{}'.format(name, stat)] = (
                    float(fn(flat)))
        if tb_scalars:
            self._tb_writer().scalars(global_step, tb_scalars)

        # Convert to KITTI format + native AP eval
        kitti_dir, _ = kitti_writers.save_predictions_box_3d_in_kitti_format(
            self.score_threshold, dataset, self.config.pred_dir,
            output_dirs[C.OUT_DIR_BOX_3D], output_dirs[C.OUT_DIR_BOX_2D],
            global_step)

        if self.do_kitti_native_eval and self.eval_mode == 'val':
            self.run_kitti_native_eval(global_step)

        return results

    # -- native eval -------------------------------------------------------

    def compile_kitti_native_code(self):
        """Compile-on-demand hook (ref: evaluator_utils.py:457-469)."""
        binary = os.path.join(self.native_eval_dir,
                              'evaluate_object_3d_offline')
        if os.path.exists(binary):
            return True
        makefile = os.path.join(self.native_eval_dir, 'Makefile')
        if not os.path.exists(makefile):
            print('[native eval] not available at', self.native_eval_dir)
            return False
        subprocess.run(['make', '-C', self.native_eval_dir], check=True)
        return os.path.exists(binary)

    def run_kitti_native_eval(self, global_step, background=True):
        """Runs the C++ AP evaluator at both IoU regimes
        (ref: evaluator.py:528-564 forks one child per regime)."""
        if not self.compile_kitti_native_code():
            return None

        common = [self.native_eval_dir,
                  self.config.config_name,
                  str(round(self.score_threshold, 3)),
                  str(int(global_step)),
                  os.path.abspath(self.config.pred_dir),
                  os.path.abspath(os.path.join(
                      self.dataset.data_split_dir, 'label_2')),
                  self.dataset.data_split]

        # The scripts' best-effort PR-curve plotting should use this
        # process's interpreter (hosts without a bare `python` on PATH)
        env = dict(os.environ, PYTHON_BIN=sys.executable)

        procs = []
        for script_name in ('run_eval.sh', 'run_eval_low_iou.sh'):
            args = [os.path.join(self.native_eval_dir, script_name)]
            args.extend(common)
            if background:
                proc = multiprocessing.Process(
                    target=subprocess.run, args=(args,),
                    kwargs={'check': False, 'env': env})
                proc.start()
                procs.append(proc)
            else:
                subprocess.run(args, check=False, env=env)
        return procs or None

    # -- polling loops ------------------------------------------------------

    def repeated_checkpoint_run(self, max_wait_iterations=100):
        """Polls the checkpoint dir, evaluating new checkpoints as they
        appear (ref: evaluator.py:445-505)."""
        manager = trainer_lib.create_checkpoint_manager(
            self.config.checkpoint_dir)
        sample = self._first_valid_sample()

        waits = 0
        last_seen = None
        while waits < max_wait_iterations:
            steps = sorted(manager.all_steps())
            evaluated = (self.get_evaluated_ckpts()
                         if self.skip_evaluated_checkpoints else set())
            todo = [s for s in steps if s not in evaluated]

            if todo:
                waits = 0
                for step in todo:
                    state = self.restore_checkpoint(manager, step, sample)
                    self.run_checkpoint_once(state, step)
                    self._mark_evaluated(step)
                    last_seen = step
            else:
                waits += 1
                time.sleep(self.eval_wait_interval)

        return last_seen

    def run_latest_checkpoints(self, ckpt_indices=None):
        """Evaluates specific checkpoints ('all' or a list of steps)."""
        manager = trainer_lib.create_checkpoint_manager(
            self.config.checkpoint_dir)
        steps = sorted(manager.all_steps())
        if not steps:
            raise RuntimeError('No checkpoints found in ' +
                               self.config.checkpoint_dir)
        if ckpt_indices is not None and ckpt_indices != 'all':
            wanted = {int(i) for i in np.atleast_1d(ckpt_indices)}
            steps = [s for s in steps if s in wanted]

        sample = self._first_valid_sample()
        results = []
        for step in steps:
            state = self.restore_checkpoint(manager, step, sample)
            results.append(self.run_checkpoint_once(state, step))
        return results

    def _first_valid_sample(self):
        sample = trainer_lib._first_valid_sample(self.dataset, self.cfg)
        self.dataset._index_in_epoch = 0
        self.dataset.epochs_completed = 0
        return sample
