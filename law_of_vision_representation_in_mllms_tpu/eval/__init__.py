from .api import Instance, LMM
from .task import Task, load_task, register_function
from .evaluator import evaluate, merge_process_results, simple_evaluate
