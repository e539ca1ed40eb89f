from .optim import SolverConfig, make_solver, learning_rate  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint  # noqa: F401
from .trainer import TrainerConfig, Trainer  # noqa: F401
