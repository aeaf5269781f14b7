"""Ticket pool and batch schedule determinism + distribution tests."""

import numpy as np

from aozora_sdxl_training_tpu.data import schedule as sched


def test_scale_timestep_counts_largest_remainder():
    assert sched.scale_timestep_counts([1, 1, 1], 10) == [4, 3, 3]
    assert sum(sched.scale_timestep_counts([3, 7, 11], 1000)) == 1000
    assert sched.scale_timestep_counts([0, 0], 10) == [0, 0]
    assert sched.scale_timestep_counts([5, 5], 0) == [0, 0]


def test_bin_counts_default_allocation():
    counts, ranges = sched.build_timestep_bin_counts(None, 1000, 1000)
    assert len(counts) == 10
    assert sum(counts) == 1000
    assert ranges[0] == (0, 100)
    assert ranges[-1] == (900, 1000)


def test_bin_counts_custom_allocation():
    alloc = {"bin_size": 250, "counts": [1, 0, 1, 2]}
    counts, ranges = sched.build_timestep_bin_counts(alloc, 100, 1000)
    assert sum(counts) == 100
    # zero-count bin dropped
    assert len(counts) == 3
    assert ranges == [(0, 250), (500, 750), (750, 1000)]


def test_ticket_pool_deterministic_and_in_range():
    alloc = {"bin_size": 100, "counts": [1] * 10}
    pool1, ranges = sched.build_timestep_ticket_pool(alloc, 500, seed=7)
    pool2, _ = sched.build_timestep_ticket_pool(alloc, 500, seed=7)
    assert pool1 == pool2
    assert len(pool1) == 500
    assert all(0 <= t < 1000 for t in pool1)
    pool3, _ = sched.build_timestep_ticket_pool(alloc, 500, seed=8)
    assert pool1 != pool3


def test_ticket_pool_respects_allocation():
    alloc = {"bin_size": 500, "counts": [3, 1]}
    pool, _ = sched.build_timestep_ticket_pool(alloc, 4000, seed=1)
    low = sum(1 for t in pool if t < 500)
    assert low == 3000


def test_stratified_pool_covers_bins_evenly():
    alloc = {"bin_size": 100, "counts": [1] * 10}
    pool, ranges = sched.build_timestep_ticket_pool(
        alloc, 1000, seed=3, stratified=True)
    assert len(pool) == 1000
    bins = sched.timestep_bin_ids(pool, ranges)
    # each bin gets exactly 100 tickets
    assert all(np.sum(bins == b) == 100 for b in range(10))
    # stratified interleave: any window of 20 should hit >= 8 distinct bins
    for start in range(0, 1000 - 20, 100):
        window = set(bins[start:start + 20].tolist())
        assert len(window) >= 8


def test_ticket_sampler_resume():
    class Cfg:
        BATCH_SIZE = 2
        MAX_TRAIN_STEPS = 50
        SEED = 5
        TIMESTEP_ALLOCATION = {"bin_size": 100, "counts": [1] * 10}
        TIMESTEP_STRATIFIED_SAMPLING = False

    s1 = sched.TimestepTicketSampler(Cfg())
    draws = [s1.sample(2).tolist() for _ in range(10)]
    s2 = sched.TimestepTicketSampler(Cfg())
    s2.set_current_step(4)
    assert s2.sample(2).tolist() == draws[4]
    s3 = sched.TimestepTicketSampler(Cfg())
    s3.load_state_dict(s1.state_dict())
    assert s3.pool_index == s1.pool_index


def test_epoch_shuffle_schedule_covers_all_images():
    s = sched.build_epoch_shuffle_image_schedule(16, 48, seed=1)
    assert len(s) == 48
    for e in range(3):
        assert sorted(s[e * 16:(e + 1) * 16].tolist()) == list(range(16))


def test_spread_schedule_anticorrelates_bins():
    n_images, n_steps = 16, 160
    alloc = {"bin_size": 100, "counts": [1] * 10}
    pool, ranges = sched.build_timestep_ticket_pool(alloc, n_steps, seed=2)
    s = sched.build_spread_image_schedule(
        n_images, n_steps, 2, sched.timestep_bin_ids(pool, ranges), len(ranges))
    assert len(s) == n_steps
    # each epoch is a permutation
    for e in range(n_steps // n_images):
        assert sorted(s[e * n_images:(e + 1) * n_images].tolist()) == list(range(n_images))
    # anti-correlation: consecutive same-image occurrences should rarely share a bin
    bins = sched.timestep_bin_ids(pool, ranges)
    repeats = 0
    conflicts = 0
    last_bin = {}
    for step in range(n_steps):
        img = int(s[step])
        b = int(bins[step])
        if img in last_bin:
            repeats += 1
            if last_bin[img] == b:
                conflicts += 1
        last_bin[img] = b
    assert conflicts <= repeats * 0.2


def test_bucket_batches_group_by_bucket():
    keys = [(1024, 1024)] * 6 + [(768, 1344)] * 6
    batches = sched.bucket_batches_for_epoch(keys, 2, seed=0, epoch=0)
    assert len(batches) == 6
    for batch in batches:
        bks = {keys[i] for i in batch}
        assert len(bks) == 1
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(12))


def test_bucket_batches_interleave_avoids_repeat():
    keys = [(1024, 1024)] * 8 + [(768, 1344)] * 8
    batches = sched.bucket_batches_for_epoch(keys, 2, seed=3, epoch=0)
    same = sum(1 for a, b in zip(batches, batches[1:])
               if keys[a[0]] == keys[b[0]])
    assert same <= 1  # strict alternation when counts are balanced


def test_batch_schedule_length_and_resume():
    keys = [(1024, 1024)] * 4
    schedule = sched.build_epoch_shuffle_batch_schedule(keys, 10, 2, seed=1)
    assert len(schedule) == 10
    replay = sched.PrecomputedBatchSchedule(schedule, start_step=4)
    assert len(replay) == 6
    assert list(replay) == schedule[4:]


def test_spread_batch_schedule_batchsize_2():
    keys = [(1024, 1024)] * 8 + [(768, 1344)] * 8
    alloc = {"bin_size": 100, "counts": [1] * 10}
    pool, ranges = sched.build_timestep_ticket_pool(alloc, 64, seed=2)
    schedule = sched.build_spread_batch_schedule(keys, 32, 2, 2, pool, ranges)
    assert len(schedule) == 32
    for batch in schedule:
        assert len({keys[i] for i in batch}) == 1
