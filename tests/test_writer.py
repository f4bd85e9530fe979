"""Writer tests — including the param-histogram path the reference
silently broke (writer.py:89-105 hasattr checks against renamed attrs)."""
import os

import numpy as np

import jax

from dexgangrasp_tpu.utils.writer import Writer


def test_writer_logs_and_tensorboard(tmp_path):
    w = Writer(str(tmp_path), to_tensorboard=True)
    w.print_current_train_loss(1, 0, {"total_loss_gen": 1.5,
                                      "vector_metric": np.ones(3)}, 0.1, 0.2)
    w.print_current_eval_loss(1, {"total_loss_eva": 0.7})
    w.print_acc(1, 0.9, 0.8)
    w.plot_train_loss({"total_loss_gen": 1.5}, 10)
    w.plot_eval_loss({"total_loss_eva": 0.7}, 1)
    # histograms over a real param tree — must not silently no-op
    from dexgangrasp_tpu.models.networks import init_evaluator

    _, p, _ = init_evaluator(jax.random.PRNGKey(0))
    w.plot_model_weights(p, 10)
    w.close()

    loss_log = open(os.path.join(str(tmp_path), "loss_log.txt")).read()
    assert "total_loss_gen: 1.50000" in loss_log
    eval_log = open(os.path.join(str(tmp_path), "eval_log.txt")).read()
    assert "total_loss_eva: 0.70000" in eval_log
    acc_log = open(os.path.join(str(tmp_path), "testacc_log.txt")).read()
    assert "tp_rate: 0.9000" in acc_log
    # tensorboard event files written with content
    tb_dir = os.path.join(str(tmp_path), "tb")
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events
    assert os.path.getsize(os.path.join(tb_dir, events[0])) > 500
