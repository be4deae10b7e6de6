from .process_compiler import compile_process_graph, CompiledProcess
from .udf import XDataCube, run_udf

__all__ = ["compile_process_graph", "CompiledProcess", "XDataCube", "run_udf"]
