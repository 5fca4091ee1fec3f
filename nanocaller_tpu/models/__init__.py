"""JAX/flax models + weight import.

The four reference CNN architectures (SURVEY.md §2.1) re-implemented as
flax modules running under jit on TPU, with a converter that imports the
reference's released TensorFlow checkpoints / .h5 weights into JAX
pytrees so calls are probability-identical without retraining.
"""

from .snp import SNPModel, HaploidSNPModel
from .indel import IndelModel, HaploidIndelModel
from .registry import load_model
