"""dxk_tpu — TPU-native physics + locomotion-learning framework.

A Brax/MJX-style rebuild of the physics core and RL environment of
study-game-engines/directx-renderer-kurth, designed for JAX/XLA/Pallas on TPU.
"""

__version__ = "0.1.0"
