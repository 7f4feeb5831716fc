"""Checkpoint save/resume/finetune via Orbax.

Parity with reference CheckpointIO (net_utils/utils.py:21-203):
* ``save(suffix)`` writes {params, batch_stats, opt_state, epoch, min_loss}
  under ``<run_dir>/model_<suffix>`` (process-0 only, handled by Orbax);
* best/last semantics driven by the caller (engine.py), matching
  train_epoch.py:93-105;
* ``resume`` scans sibling timestamped run dirs newest-first for a
  ``model_last*`` checkpoint (utils.py:125-143);
* ``finetune`` loads network weights only, tolerating missing submodules
  (partial, module-by-module, utils.py:171-203).
"""

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path):
    return os.path.abspath(path)


class CheckpointIO:
    def __init__(self, run_dir, log_fn=print):
        self.run_dir = _abs(run_dir)
        self.log = log_fn
        self._ckptr = ocp.StandardCheckpointer()

    # -- save ---------------------------------------------------------------
    def save(self, suffix, state, epoch, min_loss):
        path = os.path.join(self.run_dir, f"model_{suffix}")
        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
            "epoch": int(epoch),
            "min_loss": float(min_loss),
        }
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        self.log(f"Saved checkpoint {path}")
        return path

    # -- load ---------------------------------------------------------------
    def _restore(self, path, template):
        return self._ckptr.restore(path, template)

    def load_into_state(self, path, state, epoch=0, min_loss=float("inf")):
        """Full restore (resume): params/batch_stats/opt_state/epoch."""
        template = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": 0,
            "epoch": 0,
            "min_loss": 0.0,
        }
        restored = self._restore(_abs(path), template)
        import jax.numpy as jnp

        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], dtype=jnp.int32),
        )
        return new_state, int(restored["epoch"]), float(restored["min_loss"])

    def load_weights(self, path, state):
        """Finetune: weights (+batch stats) only, partial per-submodule.

        Missing or shape-mismatched top-level submodules are skipped with a
        warning (reference parse_state_dict semantics).
        """
        import flax.traverse_util as tu

        path = self._materialize(path)
        loaded = ocp.StandardCheckpointer().restore(_abs(path))

        def merge(current, incoming, label):
            cur = tu.flatten_dict(current, sep="/")
            new = tu.flatten_dict(incoming or {}, sep="/")
            n_hit = 0
            for k, v in new.items():
                if k in cur and np.shape(cur[k]) == np.shape(v):
                    cur[k] = v
                    n_hit += 1
                else:
                    self.log(f"skip {label} {k} (missing or shape mismatch)")
            if n_hit < len(cur):
                self.log(f"partial {label} load: {n_hit}/{len(cur)} tensors")
            return tu.unflatten_dict(cur, sep="/")

        params = merge(jax.device_get(state.params), loaded.get("params"), "weight")
        batch_stats = merge(
            jax.device_get(state.batch_stats), loaded.get("batch_stats"), "batch stat"
        )
        return state.replace(params=params, batch_stats=batch_stats)

    def _materialize(self, path):
        """Support http(s):// weight locations (reference loads via
        torch model_zoo, net_utils/utils.py:160): download-and-extract to a
        local cache dir, then load normally."""
        if not str(path).startswith(("http://", "https://")):
            return path
        import tarfile
        import urllib.request
        import zipfile

        cache = os.path.join(self.run_dir, "downloaded_weights")
        os.makedirs(cache, exist_ok=True)
        fname = os.path.join(cache, os.path.basename(str(path)))
        if not os.path.exists(fname):
            self.log(f"Downloading weights from {path}")
            urllib.request.urlretrieve(str(path), fname)
        if zipfile.is_zipfile(fname):
            with zipfile.ZipFile(fname) as z:
                z.extractall(cache)
            return os.path.join(cache, z.namelist()[0].split("/")[0])
        if tarfile.is_tarfile(fname):
            with tarfile.open(fname) as t:
                t.extractall(cache)
                return os.path.join(cache, t.getnames()[0].split("/")[0])
        return fname

    # -- resume scan --------------------------------------------------------
    def find_resume_checkpoint(self):
        """Newest ``model_last*`` under sibling timestamped run dirs.

        Within the newest run dir that has any, the highest-epoch
        ``model_last_<k>`` wins (bare ``model_last`` counts as epoch -1) —
        reference scans newest-first (net_utils/utils.py:125-143); picking by
        os.listdir order could resume an older epoch.
        """
        parent = os.path.dirname(self.run_dir)
        if not os.path.isdir(parent):
            return None

        def epoch_of(name):
            m = re.match(r"model_last_(\d+)$", name)
            return int(m.group(1)) if m else -1

        for d in sorted(os.listdir(parent), reverse=True):
            full = os.path.join(parent, d)
            if not os.path.isdir(full):
                continue
            candidates = [
                name for name in os.listdir(full)
                if re.match(r"model_last", name)
            ]
            if candidates:
                newest = max(candidates, key=epoch_of)
                return os.path.join(full, newest)
        return None
