"""Event extraction parity vs the reference train/events.py (golden) and
training-stack smoke tests."""

import numpy as np
import pytest

from tests.conftest import load_golden_stream
from vap_realtime_tpu.train.events import (
    EventConfig, TurnTakingEvents, fill_pauses, find_island_idx_len,
    get_dialog_states,
)
from vap_realtime_tpu.train.metrics import (
    binary_metrics, event_metrics, extract_prediction_and_targets,
)


def test_find_island_idx_len():
    x = np.array([1, 1, 0, 0, 0, 2, 1, 1])
    s, d, v = find_island_idx_len(x)
    np.testing.assert_array_equal(s, [0, 2, 5, 6])
    np.testing.assert_array_equal(d, [2, 3, 1, 2])
    np.testing.assert_array_equal(v, [1, 0, 2, 1])


def test_dialog_states():
    vad = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    np.testing.assert_array_equal(get_dialog_states(vad), [1, 0, 3, 2])


def test_fill_pauses():
    # A speaks, pause, A speaks again -> pause filled for A
    vad = np.zeros((10, 2), np.float32)
    vad[0:3, 0] = 1
    vad[6:9, 0] = 1
    ds = get_dialog_states(vad)
    filled = fill_pauses(vad, ds)
    assert filled[3:6, 0].sum() == 3
    assert filled[:, 1].sum() == 0


def test_events_golden_parity():
    golden = load_golden_stream("events.npz")
    conf = EventConfig(equal_hold_shift=False)
    eventer = TurnTakingEvents(conf)
    out = eventer(golden["vad"])
    for key in ("shift", "hold", "long", "pred_shift", "short"):
        for b in range(golden["vad"].shape[0]):
            got = np.array(sorted(out[key][b]), np.int64).reshape(-1, 3)
            np.testing.assert_array_equal(
                got, golden[f"{key}_{b}"],
                err_msg=f"{key}[{b}]")
    # sampled sets: counts must match the reference's sizing rules
    np.testing.assert_array_equal(
        [len(x) for x in out["pred_shift_neg"]].__len__(),
        golden["n_pred_shift_neg"].__len__())
    assert (sum(len(x) for x in out["pred_shift_neg"])
            == golden["n_pred_shift_neg"].sum())
    assert (sum(len(x) for x in out["pred_backchannel_neg"])
            == golden["n_pred_backchannel_neg"].sum())
    assert (sum(len(x) for x in out["pred_backchannel"])
            == golden["n_pred_backchannel"].sum())


def test_extract_predictions_and_metrics():
    rs = np.random.RandomState(0)
    B, T = 2, 300
    p_now = rs.rand(B, T, 2)
    p_fut = rs.rand(B, T, 2)
    events = {
        "shift": [[(10, 20, 0)], []],
        "hold": [[(30, 40, 1)], [(5, 15, 0)]],
        "pred_shift": [[(50, 60, 0)], []],
        "pred_shift_neg": [[], [(70, 80, 1)]],
        "pred_backchannel": [[(90, 100, 1)], []],
        "pred_backchannel_neg": [[(110, 120, 0)], []],
        "long": [[(130, 140, 0)], []],
        "short": [[(150, 160, 1)], []],
    }
    preds, targets = extract_prediction_and_targets(p_now, p_fut, events)
    assert preds["hs"].shape == (30,)
    assert targets["hs"][:10].sum() == 10  # shifts labeled 1
    assert targets["hs"][10:].sum() == 0
    assert preds["hs2"].shape == (3,)
    np.testing.assert_allclose(preds["hs2"][0], p_now[0, 10:20, 0].mean())
    assert preds["ls"].shape == (20,)

    m = event_metrics(preds, targets)
    assert "hs2_balanced_accuracy" in m
    assert 0.0 <= m["hs2_balanced_accuracy"] <= 1.0


def test_binary_metrics_known_values():
    preds = np.array([0.9, 0.8, 0.2, 0.4, 0.6, 0.1])
    targets = np.array([1, 1, 1, 0, 0, 0])
    m = binary_metrics(preds, targets)
    # tp=2 fn=1 fp=1 tn=2
    assert m["accuracy"] == pytest.approx(4 / 6)
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["balanced_accuracy"] == pytest.approx(2 / 3)
