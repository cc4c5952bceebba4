from gym_pybullet_drones_tpu.runtime.rollout import (
    batch_reset,
    make_batched_step,
    rollout,
)
