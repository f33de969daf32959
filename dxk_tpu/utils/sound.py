"""Collision-sound triggers — the physics side of the audio hook.

The reference's demo wires a collisionBeginCallback that plays a 3D
"Collision" sound per begin event with a random pitch in [0.5, 1.5] and
volume = saturate(remap(contact speed, 0.2, 20, 0, 1))
(/root/reference/src/application.cpp:192-201). The audio engine itself
(XAudio2, src/audio/*) is render-build-only host code with no TPU analog;
what IS physics is the event -> (pitch, volume) mapping, which this module
reproduces so any host audio backend can consume it.

The reference event carries the contact-point relative velocity; our
collision events carry the solver's accumulated normal impulse
(events.py). Speed is recovered as impulse * (invMassA + invMassB) — the
delta-v that impulse produced on the pair, the same monotone loudness
gate (exact for head-on point contacts, a lower bound with rotation).
"""

from __future__ import annotations

import numpy as np

_RNG = None


def _default_rng():
    global _RNG
    if _RNG is None:
        _RNG = np.random.default_rng(519431)
    return _RNG


def collision_sound_triggers(scene, begins, rng=None,
                             min_speed: float = 0.2,
                             max_speed: float = 20.0,
                             pitch_range=(0.5, 1.5),
                             sound_id: str = "Collision"):
    """Map collision-begin events (events.collision_events) to playable
    triggers. Returns a list of dicts {sound_id, body_a, body_b, pitch,
    volume} with volume already remapped+saturated; zero-volume events
    (below min_speed) are dropped like inaudible sounds.

    `rng`: np.random.Generator for the random pitch (default: a shared
    module-level generator seeded 519431 once, so repeated calls advance
    the pitch sequence instead of replaying it)."""
    if rng is None:
        rng = _default_rng()
    inv_mass = np.asarray(scene.body_params.inv_mass)
    out = []
    for ev in begins:
        speed = float(ev.impulse) * float(inv_mass[ev.body_a]
                                          + inv_mass[ev.body_b])
        volume = (speed - min_speed) / (max_speed - min_speed)
        volume = min(max(volume, 0.0), 1.0)
        if volume <= 0.0:
            continue
        out.append(dict(sound_id=sound_id, body_a=ev.body_a,
                        body_b=ev.body_b,
                        pitch=float(rng.uniform(*pitch_range)),
                        volume=volume))
    return out
