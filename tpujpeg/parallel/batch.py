"""Batched decode (BASELINE.json:9 config 3): many mixed-size JPEGs,
bucketed by frame geometry, transformed as one data-parallel device pass
per bucket (SURVEY.md §3.5 call stack).

Fault isolation (SURVEY.md §5): a corrupt image marks its slot failed
and never kills the batch — host entropy decode runs per image under a
try/except, and only clean images reach the device stage.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import bitstream, transform
from ..config import DEFAULT_CONFIG, DecodeConfig
from ..decoder import _entropy_decode
from ..errors import JpegError
from ..stats import DecodeStats
from . import mesh as mesh_lib


@dataclasses.dataclass
class BatchResult:
    """Per-image outputs; `errors[i]` is set iff `images[i]` is None."""

    images: List[Optional[np.ndarray]]
    errors: Dict[int, Exception]
    stats: List[Optional[DecodeStats]]


def _bucket_key(frame: bitstream.Frame) -> Tuple:
    return (
        frame.height,
        frame.width,
        tuple((c.h, c.v) for c in frame.components),
    )


@functools.lru_cache(maxsize=64)
def _jit_batched_transform(key: Tuple, n_devices: int, axis: str):
    """One jitted, device-sharded, vmapped transform per geometry bucket."""
    height, width, hv = key
    frame = bitstream.Frame(
        progressive=False,
        precision=8,
        height=height,
        width=width,
        components=[
            bitstream.Component(index=i, cid=i, h=h, v=v, tq=0)
            for i, (h, v) in enumerate(hv)
        ],
    )
    frame.finalize()

    def one(coeffs, qtabs):
        return transform.transform_frame(frame, coeffs, qtabs)

    batched = jax.vmap(one)
    if n_devices <= 1:
        return jax.jit(batched), None
    m = mesh_lib.data_mesh(axis=axis)
    shard = NamedSharding(m, P(axis))
    fn = jax.jit(batched, in_shardings=(shard, shard), out_shardings=shard)
    return fn, m


def decode_batch(
    datas: Sequence[bytes],
    config: DecodeConfig = DEFAULT_CONFIG,
    n_devices: Optional[int] = None,
) -> BatchResult:
    """Decode a batch of JPEG byte strings. Images are bucketed by
    (H, W, sampling) so each bucket is one padded device launch sharded
    over the 'data' mesh axis (SURVEY.md §2.3 DP row)."""
    if n_devices is None:
        n_devices = jax.device_count()

    n = len(datas)
    images: List[Optional[np.ndarray]] = [None] * n
    errors: Dict[int, Exception] = {}
    stats: List[Optional[DecodeStats]] = [None] * n

    # Host stage: parse + entropy decode, fault-isolated per image.
    buckets: Dict[Tuple, List[Tuple[int, list, list]]] = {}
    for i, data in enumerate(datas):
        st = DecodeStats()
        try:
            jpeg = bitstream.parse(data)
            coeffs = _entropy_decode(jpeg, config, st)
            qtabs = [jpeg.qtables[c.tq] for c in jpeg.frame.components]
        except JpegError as e:
            errors[i] = e
            continue
        except Exception as e:  # defensive: never kill the batch
            errors[i] = JpegError(f"internal decode failure: {e!r}")
            continue
        st.width, st.height = jpeg.frame.width, jpeg.frame.height
        st.n_components = jpeg.frame.n_components
        stats[i] = st
        buckets.setdefault(_bucket_key(jpeg.frame), []).append((i, coeffs, qtabs))

    # Device stage: one sharded launch per bucket.
    for key, entries in buckets.items():
        fn, _ = _jit_batched_transform(key, n_devices, config.mesh_axis)
        b = len(entries)
        pad = (-b) % max(n_devices, 1)
        ncomp = len(entries[0][1])
        coeff_stack = []
        qtab_stack = []
        for ci in range(ncomp):
            arrs = [e[1][ci] for e in entries]
            arrs += [np.zeros_like(arrs[0])] * pad
            coeff_stack.append(jnp.asarray(np.stack(arrs)))
            qs = [e[2][ci] for e in entries]
            qs += [np.zeros_like(qs[0])] * pad
            qtab_stack.append(jnp.asarray(np.stack(qs)))
        out = np.asarray(jax.block_until_ready(fn(coeff_stack, qtab_stack)))
        for slot, (i, _, _) in enumerate(entries):
            images[i] = out[slot]

    return BatchResult(images=images, errors=errors, stats=stats)
