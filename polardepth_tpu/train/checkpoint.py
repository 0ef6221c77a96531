"""Checkpointing: one Orbax-managed train-state pytree + per-component export.

The reference saves per-component .pth files (rgb_encoder.pth,
mono_depth.pth, ..., adam.pth) once per epoch with no mid-epoch resume
(trainer.py:1586-1691).  Here the whole TrainState (params, BN stats, Adam
moments, step) is checkpointed atomically at any step; `export_components`
additionally writes per-component .npz files keyed by flattened parameter
paths for interop/inspection, mirroring the reference's component layout.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax

from polardepth_tpu.config import Config


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(directory: str, state, cfg: Optional[Config] = None,
         step: Optional[int] = None, extra=None) -> str:
    """Write the full train state under directory/step_<N>.

    extra: optional auxiliary pytree checkpointed alongside the state (e.g.
    the student path's adaptive depth-bin trackers — the reference stuffs
    min/max_depth_bin into the matching encoder's state_dict,
    trainer.py:1608-1613)."""
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    if extra is not None:
        tree["extra"] = extra
    _checkpointer().save(path, tree, force=True)
    if cfg is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            f.write(cfg.to_json())
    return path


def _checkpoint_has_extra(path: str) -> bool:
    """True if the checkpoint at `path` was written with an 'extra' tree
    (read from orbax metadata; conservative True on metadata failure so a
    real restore error is raised by the restore itself, not masked here)."""
    try:
        md = _checkpointer().metadata(os.path.abspath(path))
        return "extra" in md.item_metadata.tree
    except Exception:
        return True


def restore(path: str, state, extra=None):
    """Restore into an existing (abstract or concrete) state template.
    With an `extra` template, returns (state, extra); else just state.
    A checkpoint written without `extra` restores with the template's own
    extra values (so resume still works, just without e.g. exact data-order
    recovery)."""
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    if extra is not None and not _checkpoint_has_extra(path):
        # Legacy checkpoint written without 'extra': fall back to the
        # template's own extra values (resume works, but without exact
        # data-order recovery).  Decided from the checkpoint's metadata, not
        # a blanket try/except — genuine corruption or shape mismatches must
        # surface as the real error.
        print(f"checkpoint {path} has no 'extra' tree; exact data-order "
              "resume unavailable, using template values")
        restored = _checkpointer().restore(os.path.abspath(path), item=tree)
        restored["extra"] = extra
    else:
        if extra is not None:
            tree["extra"] = extra
        restored = _checkpointer().restore(os.path.abspath(path), item=tree)
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    if extra is not None:
        return state, restored["extra"]
    return state


def latest_step_dir(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for d in os.listdir(directory):
        if d.startswith("step_"):
            try:
                steps.append((int(d.split("_", 1)[1]), d))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])


def _reference_shaped_components(params):
    """Component view of a param/batch_stats tree in the REFERENCE's split:
    a fused_encoders subtree (either execution plan — params are stored
    grouped-shape in both) is split back into xolp_encoder /
    normals_encoder so exports are interchangeable across configurations."""
    if "fused_encoders" not in params:
        return params
    from polardepth_tpu.models.pre_encoders import split_modality_params

    out = {k: v for k, v in params.items() if k != "fused_encoders"}
    xolp, normals = split_modality_params(params["fused_encoders"])
    out["xolp_encoder"] = xolp
    out["normals_encoder"] = {"ShallowEncoder_0": normals}
    return out


def export_components(directory: str, state) -> list[str]:
    """Per-component .npz export matching the reference's component split
    (rgb_encoder / xolp_encoder / normals_encoder / joint_encoder /
    mono_depth; trainer.py:1597-1617).  A fused-encoder state exports the
    same reference-shaped files as a separate-encoder one."""
    os.makedirs(directory, exist_ok=True)
    written = []
    params = _reference_shaped_components(jax.device_get(state.params))
    stats = (_reference_shaped_components(jax.device_get(state.batch_stats))
             if state.batch_stats else {})
    for component, tree in params.items():
        arrays = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            arrays[key] = np.asarray(leaf)
        if stats and component in stats:
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    stats[component])[0]:
                key = "stats/" + "/".join(str(getattr(p, "key", p))
                                          for p in path)
                arrays[key] = np.asarray(leaf)
        out = os.path.join(directory, f"{component}.npz")
        np.savez(out, **arrays)
        written.append(out)
    return written


def import_components(directory: str, state):
    """Load per-component .npz exports back into a state (shape-checked).

    Exports are always reference-shaped (see export_components); a
    fused-encoder state re-fuses xolp_encoder.npz + normals_encoder.npz on
    the way in, so components round-trip across execution plans."""
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    if "fused_encoders" in params and os.path.isfile(
            os.path.join(directory, "xolp_encoder.npz")) and os.path.isfile(
            os.path.join(directory, "normals_encoder.npz")):
        from polardepth_tpu.models.pre_encoders import fuse_modality_params

        def load_tree(name):
            raw = dict(np.load(os.path.join(directory, f"{name}.npz")))
            tree, stat = {}, {}
            for key, arr in raw.items():
                dst, parts = (stat, key.split("/")[1:]) \
                    if key.startswith("stats/") else (tree, key.split("/"))
                for p in parts[:-1]:
                    dst = dst.setdefault(p, {})
                dst[parts[-1]] = arr
            return tree, stat
        xt, xs = load_tree("xolp_encoder")
        nt, ns = load_tree("normals_encoder")
        fused_p = fuse_modality_params(xt, nt["ShallowEncoder_0"])

        def _checked(cur, new):
            new = np.asarray(new)
            assert new.shape == np.asarray(cur).shape, \
                ("fused_encoders", new.shape, np.asarray(cur).shape)
            return new
        params["fused_encoders"] = jax.tree_util.tree_map(
            _checked, params["fused_encoders"], fused_p)
        if stats and "fused_encoders" in stats:
            stats["fused_encoders"] = fuse_modality_params(
                xs, ns["ShallowEncoder_0"])
    for component in list(params.keys()):
        path = os.path.join(directory, f"{component}.npz")
        if not os.path.isfile(path):
            continue
        raw = dict(np.load(path))

        def rebuild(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                key = f"{prefix}{k}"
                if isinstance(v, dict):
                    out[k] = rebuild(v, key + "/")
                else:
                    arr = raw[key]
                    assert arr.shape == v.shape, (component, key)
                    out[k] = arr
            return out

        params[component] = rebuild(params[component])
        if stats and component in stats:
            def rebuild_stats(tree, prefix="stats/"):
                out = {}
                for k, v in tree.items():
                    key = f"{prefix}{k}"
                    if isinstance(v, dict):
                        out[k] = rebuild_stats(v, key + "/")
                    else:
                        out[k] = raw[key]
                return out
            stats[component] = rebuild_stats(stats[component])
    return state.replace(params=params, batch_stats=stats)
