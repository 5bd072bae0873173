from fmcw_radar_processing_tpu.models.vgg import VGG16, SmallCNN  # noqa: F401
from fmcw_radar_processing_tpu.models.train import (  # noqa: F401
    TrainConfig,
    Trainer,
    make_train_step,
)
from fmcw_radar_processing_tpu.models.data import (  # noqa: F401
    augment_batch,
    load_image_folder,
    merge_class_folders,
    split_dataset,
    split_dataset_combined_folders,
)
