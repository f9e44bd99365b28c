from .api import Instance, LMM
from .task import Task, load_task, register_function
from .evaluator import evaluate, simple_evaluate
