from .synth import synth_homography_batch, random_homography  # noqa: F401
from .train import TrainConfig, make_train_step, init_train_state  # noqa: F401
from .augment import FlowAugmentor  # noqa: F401
from .datasets import FlowDataset, MpiSintel, FlyingChairs, KITTI, batch_iterator  # noqa: F401
