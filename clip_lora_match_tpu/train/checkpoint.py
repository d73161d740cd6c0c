"""Training checkpoint/resume via Orbax.

The reference only saves per-epoch PEFT adapter dirs and can never resume
(optimizer state discarded, ref:scripts/train_lora.py:243-247, SURVEY §5).
Here every checkpoint carries {lora, opt_state, step, epoch, rng} so training
restarts exactly where it stopped; per-epoch PEFT-compatible exports are still
written for drop-in parity with the reference's ``epoch_{k}`` directories.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.train.step import TrainState

log = get_logger("ckpt")


def _rng_to_np(rng) -> np.ndarray:
    """Typed key arrays (e.g. the TPU rbg dropout keys) serialize via their
    raw key data; classic uint32 PRNGKeys pass through unchanged."""
    rng = jax.device_get(rng)
    if jax.numpy.issubdtype(getattr(rng, "dtype", None), jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(rng))
    return np.asarray(rng)


def _rng_from_np(data: np.ndarray, template):
    if jax.numpy.issubdtype(getattr(template, "dtype", None), jax.dtypes.prng_key):
        data = np.asarray(data, np.uint32)
        want = int(np.prod(jax.random.key_data(template).shape))
        if data.size != want:
            # legacy checkpoint written under a different PRNG impl (e.g. a
            # (2,) threefry key resumed into an rbg state): derive the new
            # key deterministically from the old key data — dropout-stream
            # continuity across an impl upgrade is not meaningful, but
            # determinism of the resumed run is
            data = np.resize(data, want)
        return jax.random.wrap_key_data(
            jax.numpy.asarray(data),
            impl=jax.random.key_impl(template),
        )
    data = np.asarray(data, np.uint32)
    if data.size != 2:
        data = np.resize(data, 2)  # typed-key checkpoint resumed as threefry
    return data


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, epoch: int) -> None:
        payload = {
            "lora": jax.device_get(state.lora),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
            "epoch": int(epoch),
            "rng": _rng_to_np(state.rng),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        log.info("saved checkpoint step=%d epoch=%d", step, epoch)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template_state: TrainState) -> Optional[tuple[TrainState, int]]:
        """Restore latest checkpoint into the template's pytree structure.
        Returns (state, epoch) or None when no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "lora": jax.device_get(template_state.lora),
            "opt_state": jax.device_get(template_state.opt_state),
            "step": 0,
            "epoch": 0,
            "rng": _rng_to_np(template_state.rng),
        }
        try:
            payload = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except Exception as first_err:
            # checkpoint written under a different PRNG impl: the stored rng
            # buffer is (2,) threefry vs (4,) rbg (or vice versa) — retry
            # with the other shape; _rng_from_np converts deterministically.
            # Any OTHER restore failure (corrupt file, opt-state structure
            # drift) re-raises the original error, not the retry's.
            alt = 2 if template["rng"].size == 4 else 4
            template["rng"] = np.zeros(alt, np.uint32)
            try:
                payload = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(template)
                )
            except Exception:
                raise first_err
            log.warning(
                "checkpoint rng impl differs from current config; key "
                "re-derived deterministically from stored data"
            )
        state = TrainState(
            lora=payload["lora"],
            opt_state=payload["opt_state"],
            step=np.asarray(payload["step"], np.int32),
            rng=_rng_from_np(payload["rng"], template_state.rng),
        )
        log.info("restored checkpoint step=%d epoch=%d", step, payload["epoch"])
        return state, int(payload["epoch"])

    def close(self) -> None:
        self._mgr.close()
