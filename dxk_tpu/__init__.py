"""dxk_tpu — TPU-native physics + locomotion-learning framework.

A Brax/MJX-style rebuild of the physics core and RL environment of
study-game-engines/directx-renderer-kurth, designed for JAX/XLA on TPU.

Top-level API:
    SceneBuilder      — describe bodies/colliders/joints, finalize() -> Scene
    physics_step      — jittable (Scene, State, PhysicsSettings, dt) -> (State, StepInfo)
    PhysicsSettings   — solver iterations / mode ("scan"|"jacobi"|
                        "colored"|"fused"|"fused_seq")
    apply_ray_impulse — poke interaction
    LocoEnv           — vmappable ragdoll locomotion environment
    islandize         — decompose a scene of identical sub-structures into
                        lane-batch islands (scene/islands.py)
"""

__version__ = "0.1.0"

from dxk_tpu.physics import PhysicsSettings, apply_ray_impulse, physics_step  # noqa: F401
from dxk_tpu.scene import SceneBuilder  # noqa: F401


def __getattr__(name):
    # lazy: avoid importing flax/optax-heavy modules unless used
    if name == "LocoEnv":
        from dxk_tpu.envs.loco_env import LocoEnv
        return LocoEnv
    if name == "islandize":
        from dxk_tpu.scene.islands import islandize
        return islandize
    raise AttributeError(name)
