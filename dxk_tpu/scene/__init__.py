from dxk_tpu.scene.builder import SceneBuilder  # noqa: F401
from dxk_tpu.scene.scene import (  # noqa: F401
    Scene, State, StepInfo, MotorControls, ClothState,
    SHAPE_SPHERE, SHAPE_CAPSULE, SHAPE_CYLINDER, SHAPE_BOX, SHAPE_HULL,
)
from dxk_tpu.scene.session import SceneSession  # noqa: F401
