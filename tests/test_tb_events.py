"""TensorBoard event mirroring: scalars written by the trainer's logger
must be readable by TensorBoard's own event loader (the artifact a
reference user points `tensorboard --logdir` at; ref:
src/monopsr/core/trainer.py:196-205, core/summary_utils.py:69-86)."""

import glob
import os

from monopsr_tpu.train.trainer import ScalarLogger
from monopsr_tpu.utils.tb_events import TBWriter


def _read_scalars(logdir):
    from tensorboard.backend.event_processing import event_accumulator
    acc = event_accumulator.EventAccumulator(logdir)
    acc.Reload()
    return {tag: [(e.step, e.value) for e in acc.Scalars(tag)]
            for tag in acc.Tags()['scalars']}


def test_scalar_logger_writes_tb_events(tmp_path):
    logdir = str(tmp_path)
    logger = ScalarLogger(logdir)
    logger.log(10, {'total_loss': 1.5, 'lwh': 0.25})
    logger.log(20, {'total_loss': 0.75, 'lwh': 0.20})
    logger.close()

    assert glob.glob(os.path.join(logdir, 'events.out.tfevents.*'))
    scalars = _read_scalars(logdir)
    assert scalars['total_loss'] == [(10, 1.5), (20, 0.75)]
    assert scalars['lwh'][1] == (20, 0.20000000298023224)
    # JSONL sink still present alongside
    assert os.path.exists(os.path.join(logdir, 'train_log.jsonl'))


def test_tb_writer_disabled_is_noop(tmp_path):
    writer = TBWriter(str(tmp_path / 'off'), enabled=False)
    writer.scalars(1, {'x': 1.0})
    writer.close()
    assert not glob.glob(str(tmp_path / 'off' / '*'))


def test_tb_writer_skips_non_numeric(tmp_path):
    logdir = str(tmp_path / 'mixed')
    writer = TBWriter(logdir)
    writer.scalars(5, {'ok': 2.0, 'bad': 'not-a-number'})
    writer.close()
    scalars = _read_scalars(logdir)
    assert list(scalars) == ['ok']
