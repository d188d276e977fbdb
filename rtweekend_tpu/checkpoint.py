"""Checkpoint / resume of render accumulation state.

The reference renders one-shot and overwrites out.png (Makefile:5); a
preempted run loses everything. Here the accumulation buffer
(radiance_sum [H,W,3] + samples_done) IS the resumable state (SURVEY.md
§5): saving it between sample batches makes long multi-hour renders
preemption-safe, and resuming continues the EXACT same sample sequence
(counter-based RNG keys samples by index, not by history).
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class RenderState:
    accum: np.ndarray          # radiance sums [H, W, 3]
    samples_done: int
    meta: dict                 # config fingerprint


def _meta(scene_name, width, height, spp, max_depth, seed) -> dict:
    return dict(
        scene=scene_name, width=width, height=height,
        samples_per_pixel=spp, max_depth=max_depth, seed=seed, version=1,
    )


def save(path: str, state: RenderState) -> None:
    """Atomic save (write temp + rename) so preemption mid-save cannot
    corrupt the checkpoint."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                accum=np.asarray(state.accum),
                samples_done=np.int64(state.samples_done),
                meta=json.dumps(state.meta),
            )
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str) -> Optional[RenderState]:
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return RenderState(
            accum=z["accum"],
            samples_done=int(z["samples_done"]),
            meta=json.loads(str(z["meta"])),
        )


def render_resumable(
    scene,
    camera,
    scene_name: str,
    width: int,
    height: int,
    samples_per_pixel: int,
    max_depth: int,
    background,
    seed,
    checkpoint_path: str,
    *,
    checkpoint_every: int = 4,
    rays_per_chunk: int = 1 << 20,
    use_pallas: Optional[bool] = None,
    progress: bool = False,
):
    """Like render.render() but checkpointing every `checkpoint_every`
    batches and resuming from `checkpoint_path` when compatible.

    Uses the SAME hot path as render.render() — the compacted Pallas
    driver with end-of-run overflow recovery — so resumable renders pay
    no throughput penalty. Overflow flags are additionally resolved just
    before each checkpoint save (the save's D2H fetch syncs anyway), so
    a saved checkpoint is never silently biased."""
    from rtweekend_tpu.render import (
        _capacities_for,
        _recover_overflows,
        default_use_pallas,
        render_batch,
        render_batch_compact,
    )

    meta = _meta(scene_name, width, height, samples_per_pixel, max_depth, seed)
    state = load(checkpoint_path)
    if state is not None and state.meta != meta:
        state = None  # config changed: restart
    done = state.samples_done if state else 0
    accum = (
        jnp.asarray(state.accum)
        if state
        else jnp.zeros((height, width, 3), jnp.float32)
    )

    if use_pallas is None:
        use_pallas = default_use_pallas(scene, jnp.float32)
    capacities = _capacities_for(background)
    background = jnp.asarray(background, jnp.float32)
    seed_u = jnp.uint32(seed)
    n_pix = width * height
    batch = max(1, min(samples_per_pixel, rays_per_chunk // n_pix))
    while batch > 1 and samples_per_pixel % batch:
        batch -= 1

    def recover(accum, overflows):
        return _recover_overflows(
            accum, overflows, scene, camera, background, seed_u,
            width=width, height=height, max_depth=max_depth,
            capacities=capacities,
        )

    i = 0
    overflows = []
    while done < samples_per_pixel:
        n = min(batch, samples_per_pixel - done)
        if use_pallas:
            accum, ovf = render_batch_compact(
                scene, camera, background, seed_u, jnp.int32(done), accum,
                width=width, height=height, n_samples=n, max_depth=max_depth,
                capacities=capacities,
            )
            overflows.append((done, n, ovf))
        else:
            accum = render_batch(
                scene, camera, background, seed_u, jnp.int32(done), accum,
                width=width, height=height, n_samples=n, max_depth=max_depth,
                use_pallas=use_pallas,
            )
        done += n
        i += 1
        if i % checkpoint_every == 0 and done < samples_per_pixel:
            accum = recover(accum, overflows)
            overflows = []
            save(
                checkpoint_path,
                RenderState(np.asarray(accum), done, meta),
            )
        if progress:
            print(f"\rsamples: {done}/{samples_per_pixel}   ", end="", flush=True)
    if progress:
        print()
    accum = recover(accum, overflows)
    save(checkpoint_path, RenderState(np.asarray(accum), done, meta))
    return accum
