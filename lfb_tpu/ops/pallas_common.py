"""Shared helpers for the Pallas kernels."""

from __future__ import annotations

import jax


def out_struct(shape, dtype, like: jax.Array) -> jax.ShapeDtypeStruct:
    """``ShapeDtypeStruct`` for a ``pallas_call`` output, inheriting the
    varying-mesh-axes (vma) type of an input operand.

    Inside a ``shard_map`` body with ``check_vma=True`` (the default), a
    pallas_call must declare which mesh axes its outputs vary over; the
    output of every kernel here varies exactly like its main data operand.
    Outside shard_map the vma set is empty and this reduces to a plain
    ShapeDtypeStruct.
    """
    vma = getattr(jax.typeof(like), 'vma', None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
