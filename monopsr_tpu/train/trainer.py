"""Training runtime: jitted train step, checkpointing, resume, logging.

Behavioral twin of the reference trainer
(ref: src/monopsr/core/trainer.py:19-212): global-norm clip 1.0, Adam
with staircase exponential decay, EMA weights, checkpoint every
`checkpoint_interval`, automatic resume from the latest checkpoint
unless `overwrite_checkpoints`, loss summaries every `summary_interval`.

TPU-first differences: the whole step (GT crops + fwd + bwd + update)
is one jitted XLA program; the image batch axis shards over a 'data'
mesh; checkpoints are Orbax; summaries go to a JSONL scalar log.
"""

import json
import os
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from monopsr_tpu import constants as C
from monopsr_tpu.datasets.kitti import kitti_dataset as kd
from monopsr_tpu.models import monopsr
from monopsr_tpu.parallel import mesh as mesh_lib
from monopsr_tpu.train import optimizer as opt_lib
from monopsr_tpu.train.train_state import TrainState
from monopsr_tpu.utils import transfer

# Batch keys shipped to the device for training
DEVICE_KEYS = (
    'image',
    C.SAMPLE_LABEL_BOXES_2D, C.SAMPLE_LABEL_BOXES_2D_NORM,
    C.SAMPLE_LABEL_BOXES_3D,
    C.SAMPLE_VIEWING_ANGLES_2D, C.SAMPLE_VIEWING_ANGLES_3D,
    C.SAMPLE_LABEL_CLASS_INDICES, C.SAMPLE_MEAN_LWH,
    C.SAMPLE_PROP_CEN_Z_OFFSET, kd.SAMPLE_CEN_Y_OFFSETS,
    C.SAMPLE_CAM_P, C.SAMPLE_DEPTH_MAP,
    kd.SAMPLE_INSTANCE_IMAGE, kd.SAMPLE_INSTANCE_INDICES,
    C.SAMPLE_ALPHAS, C.SAMPLE_ALPHA_BINS, C.SAMPLE_ALPHA_REGS,
    C.SAMPLE_ALPHA_VALID_BINS,
)


def prepare_sample(sample_dict, image_input_shape):
    """Host-side collation: resize the image, keep device keys only.

    The reference resizes after mean subtraction in-graph
    (ref: img_preprocessor.py:12-35); resize and mean-sub commute for a
    linear resampler, so the resize runs here on the host and the mean
    subtraction stays fused on device.

    The big arrays ship in compact encodings (~3x fewer host->device
    bytes; see monopsr.decode_device_sample for the device-side casts):
    the image as uint8 (it is uint8-valued from disk/augmentation; the
    resize interpolants round to <=0.5/255 pre-normalization), the
    depth map as the uint16 metres*256 its png stores (lossless), the
    instance image as uint8 indices (lossless, indices < 255).
    """
    out = {}
    image = sample_dict[C.SAMPLE_IMAGE_INPUT]
    if image.dtype == np.uint8:
        # Fixed-point SIMD bilinear straight to uint8 (no float round
        # trip; differs from the float path by at most 1 LSB on
        # interpolated pixels — inside the <=0.5/255 envelope above)
        out['image'] = cv2.resize(
            image, (image_input_shape[1], image_input_shape[0]),
            interpolation=cv2.INTER_LINEAR)
    else:
        resized = cv2.resize(
            np.asarray(image, np.float32),
            (image_input_shape[1], image_input_shape[0]),
            interpolation=cv2.INTER_LINEAR)
        out['image'] = np.clip(np.rint(resized), 0, 255).astype(np.uint8)
    for key in DEVICE_KEYS:
        if key == 'image':
            continue
        if key in sample_dict:   # test mode carries no GT keys
            out[key] = np.asarray(sample_dict[key])
    if C.SAMPLE_DEPTH_MAP in out:
        out[C.SAMPLE_DEPTH_MAP] = np.rint(
            out[C.SAMPLE_DEPTH_MAP] * 256.0).astype(np.uint16)
    if kd.SAMPLE_INSTANCE_IMAGE in out:
        out[kd.SAMPLE_INSTANCE_IMAGE] = (
            out[kd.SAMPLE_INSTANCE_IMAGE].astype(np.uint8))
    return out


def stack_samples(samples):
    """Stacks per-sample dicts into arrays with a leading batch axis."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def make_train_step(net, cfg, loss_config, tx, use_ema, ema_decay,
                    jit=True):
    """Builds the jitted train step over a stacked sample batch.

    The forward runs the net's batch-native path (one flat box axis,
    true image batch on the full tower) — vmapping the per-sample
    forward instead measures ~1.7x slower on the towers' fwd+bwd
    (scripts/diag_forward_bisect.py). GT assembly and the losses stay
    vmapped per sample (per-image gathers + light geometry).

    jit=False returns the raw traceable function (for callers that
    embed the step inside a larger program, e.g. a lax.scan of
    multiple steps).
    """

    def train_step(state, batch):
        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state.batch_stats}
            outputs, mutated = net.apply(
                variables, **monopsr.net_inputs_from_batch(batch),
                train=True, mutable=['batch_stats'])

            def per_sample(sample, sample_outputs):
                gt = monopsr.build_gt_dict(cfg, sample, sample_outputs)
                sample_outputs, gt = monopsr.add_global_outputs(
                    cfg, sample, sample_outputs, gt)
                losses, total = monopsr.compute_losses(
                    cfg, loss_config, sample_outputs, gt)
                return total, losses

            totals, losses = jax.vmap(per_sample)(batch, outputs)
            total = jnp.mean(totals)
            return total, (jax.tree.map(jnp.mean, losses),
                           mutated['batch_stats'])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads, tx, new_batch_stats=new_stats,
            ema_decay=ema_decay if use_ema else None)
        return new_state, losses

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


class ScalarLogger:
    """JSONL scalar sink, mirrored to TensorBoard events.

    JSONL is the primary machine-readable log; when `tensorboard` is
    true (default, matching the reference's always-on summaries,
    ref: trainer.py:196-205) the same scalars also go to an
    events.out.tfevents file in `logdir` for `tensorboard --logdir`.
    """

    def __init__(self, logdir, filename='train_log.jsonl',
                 tensorboard=True):
        from monopsr_tpu.utils import tb_events
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self.tb = tb_events.TBWriter(logdir, enabled=tensorboard)

    def log(self, step, scalars):
        record = {'step': int(step)}
        record.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, 'a') as f:
            f.write(json.dumps(record) + '\n')
        self.tb.scalars(step, record)

    def close(self):
        self.tb.close()


def create_checkpoint_manager(checkpoint_dir, max_to_keep=10000):
    os.makedirs(checkpoint_dir, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(checkpoint_dir),
                                 options=options)


def save_checkpoint(manager, state, step):
    # Packed transfer: per-leaf device_get costs ~0.4s/array through the
    # remote-TPU transport, and packer compiles are reused across the
    # params-shaped optimizer/EMA subtrees (see utils.transfer).
    manager.save(int(step), args=ocp.args.StandardSave(
        transfer.device_get_packed_state(state, state.params)))


def restore_latest(manager, template_state):
    """Restores the latest checkpoint into the template's structure,
    or returns the template if none exists."""
    latest = manager.latest_step()
    if latest is None:
        return template_state, 0
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        template_state)
    restored = manager.restore(
        latest, args=ocp.args.StandardRestore(abstract))
    return restored, latest


def train(config, dataset, max_steps=None, log_every=None):
    """Full training loop driven by a parsed YAML config.

    Args:
        config: parsed experiment config (config.parse_yaml_config).
        dataset: KittiDataset in 'train' mode.
        max_steps: optional override of train_config.max_iterations.
        log_every: optional override of summary_interval.

    Returns:
        final TrainState.
    """
    train_config = config.train_config
    model_config = config.model_config
    dataset_config = config.dataset_config

    net, cfg = monopsr.create_net(model_config, dataset_config)
    loss_config = model_config.loss_config.to_dict()

    tx, schedule, use_ema, ema_decay = opt_lib.build_optimizer(
        train_config, clip_gradient_norm=1.0)

    data_parallel = int(train_config.get('data_parallel', 1) or 1)
    mesh = mesh_lib.create_mesh(min(data_parallel, len(jax.devices())))

    # Init (one sample through the net). jit'd: eager init dispatches
    # each op separately, which is pathologically slow through the
    # remote-TPU tunnel.
    rng = jax.random.PRNGKey(0)
    sample = _first_valid_sample(dataset, cfg)
    variables = jax.jit(
        lambda s: net.init(rng, **monopsr.net_inputs_from_batch(s),
                           train=False))(sample)
    # jit'd: eager optimizer-state init dispatches per-param
    state = jax.jit(
        lambda v: TrainState.create(v, tx, use_ema=use_ema))(variables)

    # Pretrained backbone weights (NPZ remap loader)
    from monopsr_tpu.train import pretrained
    state = pretrained.maybe_load_pretrained(state, model_config)

    manager = create_checkpoint_manager(
        config.checkpoint_dir,
        max_to_keep=train_config.max_checkpoints_to_keep)
    if not train_config.get('overwrite_checkpoints', False):
        state, start_step = restore_latest(manager, state)
    else:
        start_step = 0

    state = mesh_lib.replicate(mesh, state)

    raw_step = make_train_step(net, cfg, loss_config, tx,
                               use_ema, ema_decay, jit=False)
    train_step = jax.jit(raw_step, donate_argnums=(0,))

    # steps_per_dispatch K > 1: run K steps inside ONE device program
    # (lax.scan over K stacked batches). Removes per-step host dispatch
    # — ~7 ms/step on a tunneled dev host (scripts/diag_scan_train.py),
    # sub-ms but nonzero on production hosts — at the cost of K-step
    # logging granularity (the summary uses the dispatch's last step).
    # profile_step forces K=1 so the capture brackets a single step.
    steps_per_dispatch = max(1, int(
        train_config.get('steps_per_dispatch', 1) or 1))
    if train_config.get('profile_step') is not None:
        steps_per_dispatch = 1
    multi_step = None
    if steps_per_dispatch > 1:
        def _multi(state, batches):
            return jax.lax.scan(raw_step, state, batches)
        multi_step = jax.jit(_multi, donate_argnums=(0,))
    logger = ScalarLogger(
        config.logdir,
        tensorboard=bool(train_config.get('tensorboard', True)))

    max_iterations = max_steps or train_config.max_iterations
    summary_interval = log_every or train_config.summary_interval
    checkpoint_interval = train_config.checkpoint_interval
    # Global batch = per-device batch (train_config.batch_size, default
    # 1 = reference parity) x data-parallel mesh size. The image axis is
    # a plain vmapped batch axis, so each device runs batch_size
    # images' 32-proposal batches per step; gradients are averaged over
    # the whole global batch (SURVEY §2.6 "scale by data axis").
    per_device_batch = max(
        1, int(train_config.get('batch_size', 1) or 1))
    batch_size = mesh.devices.size * per_device_batch

    from monopsr_tpu.train.input_pipeline import PrefetchingLoader
    loader = PrefetchingLoader(
        dataset, batch_size, cfg.image_input_shape,
        queue_depth=int(train_config.get('prefetch_depth', 4) or 4),
        num_threads=int(train_config.get('prefetch_threads', 2) or 2))

    # Device memory stats once at start (the reference logs GPU memory
    # summaries, ref: trainer.py:92-94)
    from monopsr_tpu.utils import profiling
    mem = profiling.device_memory_stats()
    for dev, stats in mem.items():
        if stats:
            logger.log(start_step, {
                'bytes_in_use_' + dev.replace(' ', '_'):
                    stats.get('bytes_in_use', 0)})

    # Optional one-step profiler capture (train_config.profile_step: N)
    profile_step = train_config.get('profile_step')

    # Feature-map image summaries (ref: summary_utils.py:17-66 renders
    # feature-map grids into TensorBoard during training). Enabled by the
    # top-level `summary_images` config flag; grids of the backbone's map
    # and box features go to <logdir>/images at every summary interval.
    summary_images_on = bool(config.get('summary_images', False))
    capture_fn = None
    if summary_images_on:
        def capture_fn(variables_tree, sample):
            return net.apply(
                variables_tree, **monopsr.net_inputs_from_batch(sample),
                train=False, mutable=['intermediates'],
                capture_intermediates=lambda mdl, _: (
                    mdl.name == 'backbone'))
        capture_fn = jax.jit(capture_fn)

    last_time = time.time()
    step = start_step
    last_log_step = start_step
    while step < max_iterations:
        k = min(steps_per_dispatch, max_iterations - step)
        if multi_step is not None and k == steps_per_dispatch:
            stacked = jax.tree.map(
                lambda *xs: np.stack(xs),
                *[loader.get_batch() for _ in range(k)])
            if mesh.devices.size > 1:
                stacked = mesh_lib.shard_batch_stacked(mesh, stacked)
            state, losses_seq = multi_step(state, stacked)
            losses = jax.tree.map(lambda x: x[-1], losses_seq)
            # the feature-map capture below samples from `batch`
            batch = jax.tree.map(lambda x: x[-1], stacked)
            prev = step
            step += k
            crossed = (step // summary_interval >
                       prev // summary_interval)
            crossed_ckpt = (step // checkpoint_interval >
                            prev // checkpoint_interval)
        else:
            batch = loader.get_batch()
            if mesh.devices.size > 1:
                # Explicit leading-axis sharding; on a 1-device mesh
                # the jit call's own arg transfer is fewer round trips.
                batch = mesh_lib.shard_batch(mesh, batch)

            if profile_step is not None and step + 1 == int(profile_step):
                from monopsr_tpu.utils import profiling
                with profiling.trace(
                        os.path.join(config.logdir, 'profile')):
                    state, losses = train_step(state, batch)
                    jax.block_until_ready(losses)
            else:
                state, losses = train_step(state, batch)
            step += 1
            crossed = step % summary_interval == 0
            crossed_ckpt = step % checkpoint_interval == 0

        if crossed:
            losses = transfer.device_get_packed(losses)
            losses['learning_rate'] = float(schedule(step))
            losses['steps_per_sec'] = (
                (step - last_log_step) / (time.time() - last_time))
            last_time = time.time()
            last_log_step = step
            logger.log(step, losses)
            print('step {:6d}  total {:.4f}  {:.2f} steps/s'.format(
                step, float(losses['total_loss']),
                losses['steps_per_sec']))

            if capture_fn is not None:
                from monopsr_tpu.utils import summary_images
                sample0 = jax.tree.map(lambda x: x[0], batch)
                _, inter = capture_fn(
                    {'params': state.params,
                     'batch_stats': state.batch_stats}, sample0)
                feats = inter['intermediates']['backbone']['__call__'][0]
                maps_f, box_f = jax.device_get(
                    (feats[0][0], feats[1][0]))
                summary_images.save_feature_maps(
                    config.logdir, step, 'features_for_map',
                    np.asarray(maps_f, np.float32))
                summary_images.save_feature_maps(
                    config.logdir, step, 'features_for_box_3d',
                    np.asarray(box_f, np.float32))

        if crossed_ckpt or step == max_iterations:
            save_checkpoint(manager, state, step)

    loader.stop()
    logger.close()
    manager.wait_until_finished()
    return state


def _first_valid_sample(dataset, cfg):
    """Fetches one valid sample for parameter initialization."""
    for _ in range(dataset.num_samples + 1):
        batch = dataset.next_batch(1, shuffle=False)
        if batch and batch[0] is not None:
            return prepare_sample(batch[0], cfg.image_input_shape)
    raise RuntimeError('Dataset produced no valid samples')
