from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool, sync
from gym_pybullet_drones_tpu.utils.viz import animate_trajectory
