from .state import TrainState, create_train_state
from .steps import LossSpec, make_train_step, make_eval_step, SingleHeadAdapter
from .loop import Trainer
