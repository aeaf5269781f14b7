"""Training-state checkpointing (optimizer moments, counters, sampler state).

The reference pickles a ``.pt`` dict of optimizer CPU state + RNG states
(/root/reference/train.py:2515-2531).  The TPU rebuild's determinism is
*stateless* — noise and schedules are pure functions of (seed, step) — so the
state file only needs counters and the optimizer moments.  Format: one
safetensors file (``m.<param>`` / ``v.<param>`` plus the step counter) with a
JSON metadata blob for scalars, instead of a torch pickle.

Filenames mirror the reference (train.py:2518-2519):
``{stem}_step_{N}.safetensors`` + ``{stem}_training_state_step_{N}.safetensors``.
"""

from __future__ import annotations

import json
import re
import secrets
import string
from pathlib import Path

import numpy as np

from ..opt.adamw import AdamWState
from .safetensors_io import load_all, read_metadata, write_streaming


def output_model_stem(config, source_path) -> str:
    """Resolve OUTPUT_NAME with {uuid} substitution and sanitization
    (parity: train.py:2334-2349); cached per run."""
    cached = getattr(config, "_RESOLVED_OUTPUT_STEM", None)
    if cached:
        return cached
    requested = str(getattr(config, "OUTPUT_NAME", "auto") or "auto").strip()
    if requested.lower() == "auto":
        requested = f"{Path(source_path).stem}_trained_{{uuid}}"
    run_uuid = "".join(secrets.choice(string.ascii_lowercase + string.digits)
                       for _ in range(6))
    requested = requested.replace("{uuid}", run_uuid)
    requested = Path(requested).name
    if requested.lower().endswith(".safetensors"):
        requested = requested[: -len(".safetensors")]
    requested = re.sub(r'[<>:"/\\|?*\x00-\x1f]', "_", requested).strip(" .")
    resolved = requested or f"{Path(source_path).stem}_trained_{run_uuid}"
    config._RESOLVED_OUTPUT_STEM = resolved
    return resolved


def save_train_state(path, *, global_step: int, micro_step: int,
                     opt_state: AdamWState, sampler_seed: int,
                     sampler_epoch: int, timestep_sampler_state: dict | None,
                     extra: dict | None = None) -> None:
    tensors = {"opt.step": np.asarray(opt_state.step)}

    def put(prefix, name, value):
        if isinstance(value, tuple):  # int8_blockwise (codes, scales)
            tensors[f"{prefix}.{name}"] = np.asarray(value[0])
            tensors[f"{prefix}.{name}@scales"] = np.asarray(value[1])
        else:
            tensors[f"{prefix}.{name}"] = np.asarray(value)

    for name, m in opt_state.exp_avg.items():
        put("m", name, m)
    for name, v in opt_state.exp_avg_sq.items():
        put("v", name, v)
    meta = {
        "global_step": global_step,
        "micro_step": micro_step,
        "sampler_seed": sampler_seed,
        "sampler_epoch": sampler_epoch,
        "timestep_sampler_state": timestep_sampler_state,
        **(extra or {}),
    }
    write_streaming(Path(path), tensors, metadata={"json": json.dumps(meta)})


def check_resume_global_batch(resume_meta: dict, global_batch: int) -> None:
    """Refuse resuming onto a mesh that changes the schedule's global batch.

    The image/timestep schedules are pure functions of
    ``global_batch = BATCH_SIZE x dp`` (data/schedule.py); resuming a
    state trained at one global batch on a mesh that implies another would
    silently reinterpret the entire remaining schedule — breaking the
    bit-exact resume contract the reference keeps by pickling its RNG
    states (/root/reference/train.py:2515-2531).  We persist the basis in
    the train state and fail loudly on mismatch instead.
    """
    saved = resume_meta.get("schedule_global_batch")
    if saved is None:
        print("WARNING: resume state predates the schedule-global-batch "
              "guard; cannot verify the batch schedule basis matches. "
              "Proceeding — ensure BATCH_SIZE x dp is unchanged from the "
              "original run.")
        return
    if int(saved) != int(global_batch):
        raise RuntimeError(
            f"Resume refused: this training state was saved with a global "
            f"batch of {int(saved)} (BATCH_SIZE x dp of the original run), "
            f"but the current mesh/config implies {int(global_batch)}. "
            f"Resuming would reinterpret the image/timestep schedules and "
            f"break bit-exact resume. Adjust BATCH_SIZE or the device "
            f"count/AOZORA_DEVICES so BATCH_SIZE x dp = {int(saved)}, or "
            f"start a fresh run.")


def load_train_state(path) -> tuple[dict, AdamWState]:
    """Returns (meta dict, AdamWState with numpy leaves keyed like params).

    Leaves stay on HOST (numpy): a full-size moment tree is ~2x trainable
    bytes, and eagerly device-putting it here while the trainer's
    freshly-initialized zero state is still alive doubles the moment
    residency — exactly the OOM that killed the r4 full-size Anima resume
    (8.4 GB zeros + 8.4 GB restored + 4.2 GB master on a 15.5 GB chip).
    The trainer device-puts once, with the right sharding, after the zero
    state has been dropped."""
    meta = json.loads(read_metadata(path).get("json", "{}"))
    tensors = load_all(path)

    def collect(prefix):
        out = {}
        for k, t in tensors.items():
            if not k.startswith(prefix) or k.endswith("@scales"):
                continue
            name = k[len(prefix):]
            scales = tensors.get(f"{prefix}{name}@scales")
            out[name] = ((np.asarray(t), np.asarray(scales))
                         if scales is not None else np.asarray(t))
        return out

    step = np.asarray(tensors.get("opt.step", np.zeros((), np.int32)))
    return meta, AdamWState(step=step, exp_avg=collect("m."),
                            exp_avg_sq=collect("v."))
