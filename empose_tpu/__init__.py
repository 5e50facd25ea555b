"""EM-POSE TPU: a TPU-native (JAX/XLA/Pallas) framework for full-body pose
estimation from sparse electromagnetic sensors, with the capabilities of the
EM-POSE reference (ICCV 2021)."""

__version__ = "0.1.0"

# Convenience surface (lazy imports keep `import empose_tpu` light).

def load_smplh(*a, **k):
    from empose_tpu.bodymodel.smplh import load_smplh as f
    return f(*a, **k)


def create_model(*a, **k):
    from empose_tpu.nn.models import create_model as f
    return f(*a, **k)


def load_model(*a, **k):
    from empose_tpu.eval.harness import load_model as f
    return f(*a, **k)
