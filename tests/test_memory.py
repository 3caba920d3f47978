"""Memory semantics tests — SURVEY.md §2 parity items 3, 10, 11."""

import numpy as np

from gpmpc_tpu.config.configs import MemoryConfig
from gpmpc_tpu.memory.buffer import Memory, bucket_size


def make_memory(ns=2, na=1, step=1, check=True, cap=16):
    cfg = MemoryConfig(
        check_errors_for_storage=check,
        min_error_prediction_state_for_memory=[1e-2] * ns,
        min_prediction_state_std_for_memory=[1e-2] * ns,
        points_batch_memory=cap,
    )
    return Memory(cfg, dim_input=ns + na, dim_state=ns, step_model=step)


def test_empty_memory_dummy_point():
    mem = make_memory()
    x, y = mem.get()
    assert x.shape == (1, 3) and y.shape == (1, 2)
    assert np.all(x == 0) and np.all(y == 0)


def test_targets_are_state_changes():
    mem = make_memory(check=False)
    states = [np.array([0.1 * i, 0.2 * i]) for i in range(5)]
    for i in range(4):
        mem.add(states[i], np.array([0.5]), states[i + 1], reward=0.0, iter_ctrl=i)
    mem.prepare_for_model()
    x, y = mem.get()
    assert len(x) == 4
    np.testing.assert_allclose(y, np.array([states[i + 1] - states[i] for i in range(4)]))
    np.testing.assert_allclose(x[:, :2], np.array(states[:4]))
    np.testing.assert_allclose(x[:, 2], 0.5)


def test_step_model_target_offset():
    """y_t = s[t+k-1] - s[t] with stride k (reference gp_memory.py:90-99)."""
    k = 3
    mem = make_memory(check=False, step=k)
    states = [np.array([float(i), 0.0]) for i in range(10)]
    for i in range(9):
        mem.add(states[i], np.array([0.5]), states[i + 1], reward=0.0, iter_ctrl=i)
    mem.prepare_for_model()
    x, y = mem.get()
    # indices 0, 3, 6: targets s[i+k-1+1... wait: states_next[i+k-1] - state[i]
    # states_next[j] = states[j+1], so y_i = states[i+k] - states[i] = k
    np.testing.assert_allclose(x[:, 0], [0.0, 3.0, 6.0])
    np.testing.assert_allclose(y[:, 0], [3.0, 3.0, 3.0])


def test_storage_filter_and_semantics():
    """store = any(err > thr) AND any(std > thr) when both provided
    (reference gp_memory.py:52,58 — the code uses AND; README says OR)."""
    mem = make_memory(check=True)
    s = np.zeros(2)
    s2 = np.ones(2) * 0.5
    big_err = np.array([1.0, 1.0])
    small_std = np.array([1e-5, 1e-5])
    big_std = np.array([1.0, 1.0])

    # err large, std small -> filtered out
    mem.add(s, np.array([0.5]), s2, 0.0, 0, predicted_state=s2 + big_err, predicted_state_std=small_std)
    # err large, std large -> stored
    mem.add(s, np.array([0.5]), s2, 0.0, 1, predicted_state=s2 + big_err, predicted_state_std=big_std)
    # err tiny, std large -> filtered out
    mem.add(s, np.array([0.5]), s2, 0.0, 2, predicted_state=s2, predicted_state_std=big_std)
    # no predictions -> stored
    mem.add(s, np.array([0.5]), s2, 0.0, 3)
    mem.prepare_for_model()
    x, y = mem.get()
    assert len(x) == 2
    assert mem.active_data_mask[:4].tolist() == [False, True, False, True]


def test_growth_beyond_capacity():
    """The reference's growth branch crashes (gp_memory.py:34-40); ours must not."""
    mem = make_memory(check=False, cap=4)
    for i in range(10):
        mem.add(np.array([i * 0.1, 0.0]), np.array([0.5]), np.array([(i + 1) * 0.1, 0.0]), 0.0, i)
    mem.prepare_for_model()
    x, y = mem.get()
    assert len(x) == 10


def test_deferred_processing():
    """Points added after prepare_for_model only appear after the next call."""
    mem = make_memory(check=False)
    mem.add(np.zeros(2), np.array([0.5]), np.ones(2) * 0.1, 0.0, 0)
    mem.prepare_for_model()
    assert len(mem.get()[0]) == 1
    mem.add(np.ones(2) * 0.1, np.array([0.5]), np.ones(2) * 0.2, 0.0, 1)
    assert len(mem.get()[0]) == 1  # not yet processed
    mem.prepare_for_model()
    assert len(mem.get()[0]) == 2


def test_time_feature_column():
    mem = Memory(
        MemoryConfig(check_errors_for_storage=False, points_batch_memory=8),
        dim_input=4,
        dim_state=2,
        include_time_model=True,
        step_model=1,
    )
    mem.add(np.zeros(2), np.array([0.5]), np.ones(2) * 0.1, 0.0, iter_ctrl=7)
    mem.prepare_for_model()
    x, _ = mem.get()
    assert x[0, -1] == 7.0


def test_padded_view_buckets():
    assert bucket_size(1) == 32
    assert bucket_size(32) == 32
    assert bucket_size(33) == 64
    assert bucket_size(300) == 384
    assert bucket_size(1500) == 1536
    assert bucket_size(2500) == 2560

    mem = make_memory(check=False)
    mem.add(np.zeros(2), np.array([0.5]), np.ones(2) * 0.1, 0.0, 0)
    mem.prepare_for_model()
    x_pad, y_pad, mask, b = mem.get_padded()
    assert x_pad.shape == (32, 3) and mask.sum() == 1


def test_misaligned_prepare_loses_no_points():
    """Regression (advisor round 1): prepare_for_model called at training
    triggers NOT aligned to step_model (e.g. num_repeat_actions=10,
    training_frequency=15) must neither drop incomplete-window points nor
    break stride alignment. Compare against a single aligned processing."""
    step = 3
    n_total = 17

    def fill(mem):
        for i in range(n_total):
            s = np.array([0.01 * i, -0.01 * i])
            s2 = np.array([0.01 * (i + 1), -0.01 * (i + 1)])
            mem.add(s, np.array([0.5]), s2, reward=0.0, iter_ctrl=i)

    # gold: everything added, then one prepare (all windows complete except tail)
    gold = make_memory(step=step, check=False, cap=32)
    fill(gold)
    gold.prepare_for_model()
    gx, gy = gold.get()

    # misaligned: prepare after 4, 7, 11, 16 adds (none are multiples of 3)
    mem = make_memory(step=step, check=False, cap=32)
    for i in range(n_total):
        s = np.array([0.01 * i, -0.01 * i])
        s2 = np.array([0.01 * (i + 1), -0.01 * (i + 1)])
        mem.add(s, np.array([0.5]), s2, reward=0.0, iter_ctrl=i)
        if i in (3, 6, 10, 15):
            mem.prepare_for_model()
    mem.prepare_for_model()

    x, y = mem.get()
    assert mem.len_mem_last_processed % step == 0
    np.testing.assert_array_equal(x, gx)
    np.testing.assert_array_equal(y, gy)
