"""Scene serialization — the counterpart of the reference's YAML scene
save/load (/root/reference/src/scene/serialization_yaml.cpp: whole-scene
serialization of transforms, rigid bodies, colliders, cloth) and the binary
per-entity blobs used by the editor undo stack (serialization_binary.h).

A `SceneBuilder` (the pre-bake description) round-trips through a plain
dict -> JSON; dynamic `State` snapshots round-trip through npz. Like the
reference, joint constraints ARE serialized here even though the reference's
YAML path skips them (serialization_yaml.cpp notes in SURVEY.md §2.3) —
omitting them would make reload lossy for articulated scenes.
"""

from __future__ import annotations

import json

import numpy as np
import jax

from dxk_tpu.scene.builder import SceneBuilder, _Body, _Collider, _Joint


def builder_to_dict(b: SceneBuilder) -> dict:
    return {
        "bodies": [
            {"position": body.position.tolist(),
             "rotation": body.rotation.tolist(),
             "kinematic": body.kinematic,
             "gravity_factor": body.gravity_factor,
             "linear_damping": body.linear_damping,
             "angular_damping": body.angular_damping,
             "colliders": list(body.colliders)}
            for body in b._bodies],
        "colliders": [
            {"ctype": c.ctype, "a": np.asarray(c.a).tolist(),
             "b": np.asarray(c.b).tolist(), "r": c.r,
             "rot": np.asarray(c.rot).tolist(), "friction": c.friction,
             "restitution": c.restitution, "density": c.density,
             "body": c.body, "owner_type": c.owner_type,
             "owner_index": c.owner_index, "hull_id": c.hull_id}
            for c in b._colliders],
        "joints": [
            {"kind": j.kind, "body_a": j.body_a, "body_b": j.body_b,
             "params": {k: (np.asarray(v).tolist()
                            if isinstance(v, np.ndarray) else v)
                        for k, v in j.params.items()}}
            for j in b._joints],
        # hulls round-trip completely: vertices + face planes + mass
        # properties, so reload preserves exact inertia and ray casts. The
        # reference's YAML path skips hulls entirely
        # (serialization_yaml.cpp:74-278 serializes sphere/capsule/AABB/OBB
        # only); this exceeds it like the joints above.
        "hulls": [v.tolist() for v in b._hull_geoms],
        "hull_faces": [{"normals": np.asarray(n).tolist(),
                        "offsets": np.asarray(d).tolist()}
                       for n, d in b._hull_faces],
        "hull_props": [{"mass_per_density": float(m),
                        "cog": np.asarray(c).tolist(),
                        "inertia_per_density": np.asarray(i).tolist()}
                       for m, c, i in b._hull_props],
        "force_fields": [
            {"force": np.asarray(ff["force"]).tolist(), "owner": ff["owner"]}
            for ff in b._force_fields],
        "num_triggers": b._num_triggers,
        "cloths": [{**c, "pos": np.asarray(c["pos"]).tolist(),
                    "rot": np.asarray(c["rot"]).tolist()}
                   for c in b._cloths],
    }


def builder_from_dict(d: dict) -> SceneBuilder:
    b = SceneBuilder()
    for body in d["bodies"]:
        nb = _Body(np.asarray(body["position"], np.float64),
                   np.asarray(body["rotation"], np.float64),
                   body["kinematic"], body["gravity_factor"],
                   body["linear_damping"], body["angular_damping"],
                   list(body["colliders"]))
        b._bodies.append(nb)
    for c in d["colliders"]:
        b._colliders.append(_Collider(
            c["ctype"], np.asarray(c["a"], np.float64),
            np.asarray(c["b"], np.float64), c["r"],
            np.asarray(c["rot"], np.float64), c["friction"],
            c["restitution"], c["density"], c["body"], c["owner_type"],
            c["owner_index"], c["hull_id"]))
    for j in d["joints"]:
        params = {k: (np.asarray(v, np.float64) if isinstance(v, list) else v)
                  for k, v in j["params"].items()}
        b._joints.append(_Joint(j["kind"], j["body_a"], j["body_b"], params))
    faces = d.get("hull_faces")
    props = d.get("hull_props")
    for hi, v in enumerate(d.get("hulls", [])):
        b._hull_geoms.append(np.asarray(v, np.float64))
        if props is not None:
            p = props[hi]
            b._hull_props.append((p["mass_per_density"],
                                  np.asarray(p["cog"], np.float64),
                                  np.asarray(p["inertia_per_density"],
                                             np.float64)))
        else:   # legacy dump without hull metadata: collision-only reload
            b._hull_props.append((1.0, np.zeros(3), np.eye(3)))
        if faces is not None:
            f = faces[hi]
            b._hull_faces.append((np.asarray(f["normals"], np.float64),
                                  np.asarray(f["offsets"], np.float64)))
        else:
            b._hull_faces.append((np.zeros((0, 3)), np.zeros((0,))))
    for ff in d.get("force_fields", []):
        b._force_fields.append({"force": np.asarray(ff["force"], np.float64),
                                "owner": ff["owner"]})
    b._num_triggers = d.get("num_triggers", 0)
    # "cloth" (singular) is the pre-multi-cloth format
    legacy = [d["cloth"]] if d.get("cloth") else []
    for c in legacy + list(d.get("cloths", [])):
        c = dict(c)
        c["pos"] = np.asarray(c["pos"], np.float64)
        c["rot"] = np.asarray(c["rot"], np.float64)
        b._cloths.append(c)
    return b


def save_scene(path: str, b: SceneBuilder) -> None:
    with open(path, "w") as f:
        json.dump(builder_to_dict(b), f, indent=1)


def load_scene(path: str) -> SceneBuilder:
    with open(path) as f:
        return builder_from_dict(json.load(f))


def save_state(path: str, state) -> None:
    """Dynamic state snapshot -> npz (the per-entity binary blob analog)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(path, treedef=str(treedef),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path: str, template):
    """Restore a state snapshot into the structure of `template`."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
