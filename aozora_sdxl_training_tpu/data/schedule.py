"""Deterministic timestep-ticket pools and whole-run batch schedules.

Re-implements the reference's scheduling subsystem (/root/reference/train.py:
566-882) host-side in pure numpy:

* ticket pool: GUI histogram allocation -> per-bin ticket counts via
  largest-remainder rounding -> uniform draws per bin (or stratified decks
  interleaved by fractional position), globally shuffled;
* whole-run image/batch schedules precomputed up front, either epoch-shuffled
  or "spread" (anti-correlating each image with its recent timestep bins via
  a ring-buffer history and a penalty fallback).

All randomness is numpy PCG64 keyed by the run seed, so schedules are
bit-reproducible and resumable by index — the determinism contract the
checkpoint/resume path relies on.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np


# --------------------------------------------------------------------------
# Ticket pool
# --------------------------------------------------------------------------

def timestep_bin_ids(timesteps, bin_ranges) -> np.ndarray:
    """Map each ticket to its bin id (first bin whose [start, end) contains it)."""
    starts = np.array([r[0] for r in bin_ranges], dtype=np.int64)
    ends = np.array([r[1] for r in bin_ranges], dtype=np.int64)
    ts = np.asarray(timesteps, dtype=np.int64)[:, None]
    hits = (starts[None, :] <= ts) & (ts < ends[None, :])
    # argmax returns the first matching bin; rows with no hit fall back to 0,
    # matching the reference's zeros-initialized scan.
    return np.where(hits.any(axis=1), hits.argmax(axis=1), 0).astype(np.int32)


def scale_timestep_counts(counts, target_total) -> list[int]:
    """Scale histogram counts to sum to ``target_total`` (largest remainder)."""
    target_total = max(0, int(target_total))
    counts = [max(0, int(c or 0)) for c in counts]
    total = sum(counts)
    if target_total <= 0 or total <= 0:
        return [0 for _ in counts]
    raw = [(c / total) * target_total for c in counts]
    scaled = [int(v) for v in raw]
    deficit = target_total - sum(scaled)
    if deficit > 0:
        by_fraction = sorted(range(len(raw)), key=lambda i: raw[i] - scaled[i],
                             reverse=True)
        for i in by_fraction[:deficit]:
            scaled[i] += 1
    return scaled


def build_timestep_bin_counts(allocation, total_tickets_needed,
                              total_timestep_count):
    if (not allocation or "counts" not in allocation or "bin_size" not in allocation
            or sum(allocation["counts"]) == 0):
        bin_size = max(1, int(1000 / 10))
        bins = max(1, math.ceil(1000 / bin_size))
        counts = [total_tickets_needed // bins] * bins
        for i in range(total_tickets_needed % bins):
            counts[i] += 1
    else:
        bin_size = max(1, int(allocation["bin_size"]))
        counts = scale_timestep_counts(allocation["counts"], total_tickets_needed)

    scale = total_timestep_count / 1000.0
    bin_counts, bin_ranges = [], []
    for i, count in enumerate(counts):
        if count <= 0:
            continue
        start_t = int(i * bin_size * scale)
        end_t = min(total_timestep_count, max(start_t + 1, int((i + 1) * bin_size * scale)))
        if start_t >= total_timestep_count:
            break
        bin_counts.append(int(count))
        bin_ranges.append((start_t, end_t))
    return bin_counts, bin_ranges


def _balanced_bin_order(bin_counts, seed) -> list[int]:
    """Interleave bins so each bin's tickets land evenly across the run."""
    if not bin_counts:
        return []
    rng = np.random.Generator(np.random.PCG64(seed + 7919))
    positions, bins, jitter = [], [], []
    for bin_id, count in enumerate(bin_counts):
        if count <= 0:
            continue
        positions.append((np.arange(count, dtype=np.float64) + rng.random(count)) / count)
        bins.append(np.full(count, bin_id, dtype=np.int32))
        jitter.append(rng.random(count))
    if not positions:
        return []
    order = np.lexsort((np.concatenate(jitter), np.concatenate(positions)))
    return np.concatenate(bins)[order].tolist()


def _stratified_pool(bin_counts, bin_ranges, seed) -> list[int]:
    """Per-bin shuffled value decks consumed in balanced interleave order."""
    rng = np.random.Generator(np.random.PCG64(seed))
    decks = []
    for count, (start_t, end_t) in zip(bin_counts, bin_ranges):
        values = np.arange(start_t, end_t, dtype=np.int64)
        deck: list[int] = []
        while len(deck) < count:
            deck.extend(rng.permutation(values).tolist()[: count - len(deck)])
        decks.append(deck)
    positions = [0] * len(decks)
    pool = []
    for bin_id in _balanced_bin_order(bin_counts, seed):
        pool.append(int(decks[bin_id][positions[bin_id]]))
        positions[bin_id] += 1
    return pool


def build_timestep_ticket_pool(allocation, total_tickets_needed,
                               total_timestep_count=1000, seed=42,
                               stratified=False):
    """Returns (pool, bin_ranges): one ticket per (micro_step, sample) slot."""
    total_tickets_needed = max(0, int(total_tickets_needed))
    total_timestep_count = max(1, int(total_timestep_count))
    seed = int(seed if seed else 42)
    bin_counts, bin_ranges = build_timestep_bin_counts(
        allocation, total_tickets_needed, total_timestep_count)

    if stratified:
        pool = _stratified_pool(bin_counts, bin_ranges, seed)
    else:
        rng = np.random.Generator(np.random.PCG64(seed))
        pool = []
        for count, (start_t, end_t) in zip(bin_counts, bin_ranges):
            pool.extend(rng.integers(start_t, end_t, size=max(1, int(count))).tolist())
        shuffle_rng = np.random.Generator(np.random.PCG64(seed ^ 0x5DEECE66D))
        shuffle_rng.shuffle(pool)

    if not pool:
        fallback = np.random.Generator(np.random.PCG64(seed))
        pool = fallback.integers(0, total_timestep_count,
                                 size=total_tickets_needed).tolist()
    while len(pool) < total_tickets_needed:
        pool.extend(pool[: total_tickets_needed - len(pool)])
    return pool[:total_tickets_needed], bin_ranges


class TimestepTicketSampler:
    """Sequential consumer of the precomputed ticket pool (resumable by index).

    Parity: /root/reference/train.py:2163-2210 (``TimestepSampler``).
    """

    def __init__(self, config, total_timestep_count: int = 1000,
                 batch_size: int | None = None):
        # batch_size: the *global* batch when training on a dp mesh
        # (config.BATCH_SIZE is per-dp-shard; parallel/sharding.py).
        self.batch_size = int(batch_size if batch_size is not None
                              else config.BATCH_SIZE)
        self.total_tickets_needed = int(config.MAX_TRAIN_STEPS) * self.batch_size
        self.seed = int(config.SEED if config.SEED else 42)
        self.ticket_pool, self.bin_ranges = build_timestep_ticket_pool(
            getattr(config, "TIMESTEP_ALLOCATION", None),
            self.total_tickets_needed,
            total_timestep_count,
            self.seed,
            bool(getattr(config, "TIMESTEP_STRATIFIED_SAMPLING", False)),
        )
        self.pool_index = 0

    def set_current_step(self, micro_step: int) -> None:
        self.pool_index = (micro_step * self.batch_size) % len(self.ticket_pool)

    def state_dict(self) -> dict:
        return {"pool_index": self.pool_index}

    def load_state_dict(self, state) -> None:
        if isinstance(state, dict):
            self.pool_index = int(state.get("pool_index", self.pool_index)) % len(
                self.ticket_pool)

    def sample(self, batch_size: int) -> np.ndarray:
        out = np.empty(batch_size, dtype=np.int64)
        for i in range(batch_size):
            if self.pool_index >= len(self.ticket_pool):
                self.pool_index = 0
            out[i] = self.ticket_pool[self.pool_index]
            self.pool_index += 1
        return out


# --------------------------------------------------------------------------
# Whole-run image/batch schedules
# --------------------------------------------------------------------------

def _epoch_permutation(total_images: int, seed: int, epoch: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed + epoch))
    return rng.permutation(total_images).astype(np.uint32, copy=False)


def build_epoch_shuffle_image_schedule(total_images, total_steps, seed) -> np.ndarray:
    schedule = np.empty(total_steps, dtype=np.uint32)
    offset, epoch = 0, 0
    while offset < total_steps:
        order = _epoch_permutation(total_images, seed, epoch)
        take = min(total_images, total_steps - offset)
        schedule[offset:offset + take] = order[:take]
        offset += take
        epoch += 1
    return schedule


def build_spread_image_schedule(total_images, total_steps, seed, bin_ids,
                                bin_count) -> np.ndarray:
    if total_images <= 0 or total_steps <= 0:
        return np.empty(0, dtype=np.uint32)
    if bin_count <= 1:
        return build_epoch_shuffle_image_schedule(total_images, total_steps, seed)

    history_depth = max(1, min(bin_count, math.ceil(total_steps / total_images)))
    sentinel = 255 if bin_count < 255 else 65535
    history_dtype = np.uint8 if bin_count < 255 else np.uint16
    recent_bins = np.full((total_images, history_depth), sentinel, dtype=history_dtype)
    recent_pos = np.zeros(total_images, dtype=np.uint16)
    schedule = np.empty(total_steps, dtype=np.uint32)
    offset, epoch = 0, 0

    while offset < total_steps:
        epoch_steps = min(total_images, total_steps - offset)
        remaining = np.ones(total_images, dtype=np.bool_)
        queues: dict[int, np.ndarray] = {}
        positions: dict[int, int] = {}
        rng = np.random.Generator(np.random.PCG64(seed + 104729 + epoch))

        for local_step in range(epoch_steps):
            step = offset + local_step
            bin_id = int(bin_ids[step])
            queue = queues.get(bin_id)
            if queue is None:
                queue = rng.permutation(total_images).astype(np.uint32, copy=False)
                queues[bin_id] = queue
                positions[bin_id] = 0

            chosen = None
            pos = positions[bin_id]
            while pos < total_images:
                candidate = int(queue[pos])
                pos += 1
                if remaining[candidate] and not np.any(recent_bins[candidate] == bin_id):
                    chosen = candidate
                    break
            positions[bin_id] = pos

            if chosen is None:
                rem_idx = np.flatnonzero(remaining)
                if rem_idx.size == 0:
                    break
                penalties = np.count_nonzero(recent_bins[rem_idx] == bin_id, axis=1)
                best = rem_idx[penalties == penalties.min()]
                chosen = int(best[int(rng.integers(0, len(best)))])

            schedule[step] = chosen
            remaining[chosen] = False
            slot = int(recent_pos[chosen] % history_depth)
            recent_bins[chosen, slot] = bin_id
            recent_pos[chosen] = (recent_pos[chosen] + 1) % history_depth

        offset += epoch_steps
        epoch += 1
    return schedule


def build_image_schedule(total_images, total_steps, seed, timesteps, bin_ranges,
                         force_spread) -> np.ndarray:
    if not force_spread:
        return build_epoch_shuffle_image_schedule(total_images, total_steps, seed)
    return build_spread_image_schedule(
        total_images, total_steps, seed,
        timestep_bin_ids(timesteps, bin_ranges), len(bin_ranges))


# --------------------------------------------------------------------------
# Bucket-aware batch schedules
# --------------------------------------------------------------------------

def bucket_batches_for_epoch(bucket_keys, batch_size, seed, epoch,
                             shuffle=True) -> list[list[int]]:
    """One epoch of bucket-grouped batches, interleaved to avoid repeating
    the same bucket and preferring the bucket with most remaining batches.

    Parity: /root/reference/train.py:461-537 (``BucketBatchSampler``), with
    numpy PCG64 in place of torch RNG.
    """
    total = len(bucket_keys)
    rng = np.random.Generator(np.random.PCG64(seed + epoch))
    indices = rng.permutation(total).tolist()
    if batch_size == 1:
        return [[i] for i in indices]

    buckets: dict = defaultdict(list)
    for idx in indices:
        buckets[bucket_keys[idx]].append(idx)

    bucket_batches: dict = {}
    for key in sorted(buckets):
        chunk_list = [buckets[key][i:i + batch_size]
                      for i in range(0, len(buckets[key]), batch_size)]
        if shuffle and len(chunk_list) > 1:
            order = rng.permutation(len(chunk_list)).tolist()
            chunk_list = [chunk_list[i] for i in order]
        bucket_batches[key] = chunk_list

    if not shuffle:
        return [b for key in sorted(bucket_batches) for b in bucket_batches[key]]

    batches = []
    last_key = None
    while bucket_batches:
        candidates = [k for k in bucket_batches if k != last_key] or list(bucket_batches)
        max_remaining = max(len(bucket_batches[k]) for k in candidates)
        top = [k for k in candidates if len(bucket_batches[k]) == max_remaining]
        key = top[int(rng.integers(0, len(top)))]
        batches.append(bucket_batches[key].pop(0))
        last_key = key
        if not bucket_batches[key]:
            del bucket_batches[key]
    return batches


def build_epoch_shuffle_batch_schedule(bucket_keys, total_steps, batch_size,
                                       seed) -> list[list[int]]:
    schedule: list[list[int]] = []
    epoch = 0
    while len(schedule) < total_steps:
        for batch in bucket_batches_for_epoch(bucket_keys, batch_size, seed, epoch):
            schedule.append([int(i) for i in batch])
            if len(schedule) >= total_steps:
                break
        epoch += 1
    return schedule


def build_spread_batch_schedule(bucket_keys, total_steps, batch_size, seed,
                                timesteps, bin_ranges) -> list[list[int]]:
    total_images = len(bucket_keys)
    if total_images <= 0 or total_steps <= 0:
        return []
    if batch_size == 1:
        image_schedule = build_image_schedule(
            total_images, total_steps, seed, timesteps, bin_ranges, True)
        return [[int(i)] for i in image_schedule.tolist()]

    bin_ids = timestep_bin_ids(timesteps, bin_ranges)
    total_samples = min(len(timesteps), total_steps * batch_size)
    bin_count = max(1, len(bin_ranges))
    history_depth = max(1, min(bin_count, math.ceil(total_samples / total_images)))
    sentinel = 255 if bin_count < 255 else 65535
    history_dtype = np.uint8 if bin_count < 255 else np.uint16
    recent_bins = np.full((total_images, history_depth), sentinel, dtype=history_dtype)
    recent_pos = np.zeros(total_images, dtype=np.uint16)
    bucket_indices: dict = defaultdict(list)
    for index, key in enumerate(bucket_keys):
        bucket_indices[key].append(index)

    schedule: list[list[int]] = []
    sample_offset, epoch = 0, 0
    while len(schedule) < total_steps:
        base_batches = bucket_batches_for_epoch(bucket_keys, batch_size, seed, epoch)
        remaining = np.ones(total_images, dtype=np.bool_)
        queues: dict = {}
        positions: dict = {}
        rng = np.random.Generator(np.random.PCG64(seed + 104729 + epoch))

        for base_batch in base_batches:
            if len(schedule) >= total_steps:
                break
            bucket_key = bucket_keys[base_batch[0]]
            chosen_batch: list[int] = []

            for local_index in range(len(base_batch)):
                if sample_offset + local_index >= len(bin_ids):
                    break
                bin_id = int(bin_ids[sample_offset + local_index])
                qkey = (bucket_key, bin_id)
                queue = queues.get(qkey)
                if queue is None:
                    queue = np.array(bucket_indices[bucket_key], dtype=np.uint32)
                    rng.shuffle(queue)
                    queues[qkey] = queue
                    positions[qkey] = 0

                chosen = None
                pos = positions[qkey]
                while pos < len(queue):
                    candidate = int(queue[pos])
                    pos += 1
                    if remaining[candidate] and not np.any(recent_bins[candidate] == bin_id):
                        chosen = candidate
                        break
                positions[qkey] = pos

                if chosen is None:
                    rem = np.array([i for i in bucket_indices[bucket_key] if remaining[i]],
                                   dtype=np.int64)
                    if rem.size == 0:
                        break
                    penalties = np.count_nonzero(recent_bins[rem] == bin_id, axis=1)
                    best = rem[penalties == penalties.min()]
                    chosen = int(best[int(rng.integers(0, len(best)))])

                chosen_batch.append(chosen)
                remaining[chosen] = False
                slot = int(recent_pos[chosen] % history_depth)
                recent_bins[chosen, slot] = bin_id
                recent_pos[chosen] = (recent_pos[chosen] + 1) % history_depth

            if chosen_batch:
                schedule.append(chosen_batch)
                sample_offset += len(chosen_batch)
            if sample_offset >= len(bin_ids):
                break
        epoch += 1
    return schedule


def build_image_batch_schedule(bucket_keys, total_steps, batch_size, seed,
                               timesteps, bin_ranges, force_spread) -> list[list[int]]:
    if not force_spread:
        return build_epoch_shuffle_batch_schedule(bucket_keys, total_steps,
                                                  batch_size, seed)
    return build_spread_batch_schedule(bucket_keys, total_steps, batch_size,
                                       seed, timesteps, bin_ranges)


class PrecomputedBatchSchedule:
    """Replays a packed whole-run schedule from a resume step.

    Parity: /root/reference/train.py:540-564.
    """

    def __init__(self, batches: list[list[int]], start_step: int = 0):
        self.batches = batches
        self.start_step = max(0, int(start_step or 0))

    def __iter__(self):
        for step in range(self.start_step, len(self.batches)):
            yield [int(i) for i in self.batches[step]]

    def __len__(self):
        return max(0, len(self.batches) - self.start_step)

    def set_start_batch_index(self, batch_index):
        self.start_step = max(0, int(batch_index or 0))
