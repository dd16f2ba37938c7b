"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference has no render-state persistence (SURVEY.md §5: image save
only).  Here the film accumulator (Ld sums + per-pixel sample counts) and
optimizable scene parameters round-trip through a single .npz, so a long
progressive render or optimization survives preemption — table stakes for
production TPU jobs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.models.film import Film

FORMAT_VERSION = 1


def save_film(path: str, film: Film, meta: dict | None = None) -> None:
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        ld=np.asarray(film.ld),
        samples=np.asarray(film.samples),
        **{f"meta_{k}": v for k, v in (meta or {}).items()},
    )


def load_film(path: str) -> tuple[Film, dict]:
    data = np.load(path, allow_pickle=False)
    if int(data["version"]) != FORMAT_VERSION:
        raise ValueError(f"unsupported film checkpoint version {data['version']}")
    film = Film(ld=jnp.asarray(data["ld"]), samples=jnp.asarray(data["samples"]))
    meta = {
        k[len("meta_"):]: data[k].item() if data[k].shape == () else data[k]
        for k in data.files
        if k.startswith("meta_")
    }
    return film, meta


def save_params(path: str, params) -> None:
    """Save a pytree of optimizable parameters (material table / env texels /
    light scales) as flat npz arrays."""
    import jax

    leaves, treedef = jax.tree.flatten(params)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        treedef=str(treedef),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_params(path: str, like):
    """Restore parameters into the structure of `like` (same treedef)."""
    import jax

    data = np.load(path, allow_pickle=False)
    leaves = [
        jnp.asarray(data[f"leaf_{i}"])
        for i in range(len([k for k in data.files if k.startswith("leaf_")]))
    ]
    treedef = jax.tree.structure(like)
    return jax.tree.unflatten(treedef, leaves)
