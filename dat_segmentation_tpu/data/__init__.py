from .ade20k import ADE20KDataset, train_transform, val_transform
from .loader import DataLoader, device_prefetch
