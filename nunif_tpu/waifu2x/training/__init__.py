from .dataset import Waifu2xDataset
from .trainer import Waifu2xTrainerApp, register_train, register_create_training_data
