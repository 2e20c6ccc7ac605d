from .inference import SegInferencer
from .evaluate import evaluate_dataset
