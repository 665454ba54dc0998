"""Unit tests for the evaluator's checkpoint-polling loop and ledger.

The loop contract (ref: evaluator.py:445-526): evaluate every
checkpoint not yet in the evaluated ledger, oldest first; wait between
polls; stop after max_wait_iterations empty polls; never re-evaluate a
ledgered step.
"""

import os

from monopsr_tpu.eval.evaluator import Evaluator


class FakeManager:
    def __init__(self, steps):
        self._steps = steps

    def all_steps(self):
        return list(self._steps)


def make_polling_evaluator(tmp_path, monkeypatch, steps_feed):
    """Builds an Evaluator shell with the heavy pieces stubbed."""
    ev = Evaluator.__new__(Evaluator)
    ev.skip_evaluated_checkpoints = True
    ev.eval_wait_interval = 0
    ev.ledger_path = str(tmp_path / 'evaluated_val.txt')

    evaluated = []

    manager = FakeManager(steps_feed)

    monkeypatch.setattr(
        'monopsr_tpu.train.trainer.create_checkpoint_manager',
        lambda *a, **k: manager)
    ev.config = type('C', (), {'checkpoint_dir': str(tmp_path)})()
    ev._first_valid_sample = lambda: None
    ev.restore_checkpoint = lambda mgr, step, sample: ('state', step)
    ev.run_checkpoint_once = lambda state, step: evaluated.append(step)
    return ev, evaluated, manager


def test_polls_evaluate_in_order_and_ledger_skips(tmp_path, monkeypatch):
    ev, evaluated, manager = make_polling_evaluator(
        tmp_path, monkeypatch, [4, 2])

    last = ev.repeated_checkpoint_run(max_wait_iterations=2)
    assert evaluated == [2, 4]          # oldest first
    assert last == 4
    assert ev.get_evaluated_ckpts() == {2, 4}

    # New checkpoint appears; old ones are ledger-skipped
    manager._steps = [2, 4, 6]
    last = ev.repeated_checkpoint_run(max_wait_iterations=2)
    assert evaluated == [2, 4, 6]
    assert last == 6

    # Nothing new: loop waits out and returns None without evaluating
    last = ev.repeated_checkpoint_run(max_wait_iterations=1)
    assert evaluated == [2, 4, 6]
    assert last is None


def test_ledger_file_format(tmp_path, monkeypatch):
    ev, evaluated, _ = make_polling_evaluator(tmp_path, monkeypatch, [10])
    ev.repeated_checkpoint_run(max_wait_iterations=1)
    with open(ev.ledger_path) as f:
        assert f.read().split() == ['10']
    # Appends, one step per line (ref keeps a plain int-per-line file)
    ev._mark_evaluated(12)
    assert ev.get_evaluated_ckpts() == {10, 12}


# Note: skip_evaluated_checkpoints=False makes the polling loop
# re-evaluate every checkpoint on every poll indefinitely (continuous
# monitoring mode — same contract as the reference's loop), so it is
# exercised only through run_latest_checkpoints in the integration test.
