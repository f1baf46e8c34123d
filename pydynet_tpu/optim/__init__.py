from .optimizer import (Optimizer, SGD, Adagrad, Adadelta, Adam, AdamW)
from .lr_scheduler import (_LRScheduler, ExponentialLR, StepLR, MultiStepLR,
                           CosineAnnealingLR)
