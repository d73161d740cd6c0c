"""Multi-host initialization.

Single-host (including the 8-virtual-device test mesh) needs nothing; on a
multi-host TPU slice call :func:`initialize_distributed` once per process
before any jax op — it wires `jax.distributed.initialize` from the standard
TPU environment (coordinator discovery is automatic on Cloud TPU) or from
explicit arguments for DCN-connected multislice setups (SURVEY §5:
"jax.distributed.initialize for multi-host").
"""

from __future__ import annotations

from typing import Optional

from clip_lora_match_tpu.core.logging import get_logger

log = get_logger("distributed")

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime (idempotent).

    Returns True when a multi-host setup was initialized, False for
    single-host (no-op). Explicit args override auto-discovery.
    """
    global _initialized
    if _initialized:
        return True
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            # On Cloud TPU this auto-discovers; on a plain host it raises.
            jax.distributed.initialize()
        _initialized = True
        log.info(
            "distributed runtime: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    except Exception as e:
        if coordinator_address or num_processes:
            # explicit multi-host intent: silently degrading to single-host
            # would split the job into independent trainers clobbering the
            # same outputs — fail loudly instead
            raise
        log.info("single-host mode (%s)", e)
        return False


def is_primary() -> bool:
    """True on the checkpoint/log-writing process."""
    import jax

    return jax.process_index() == 0
