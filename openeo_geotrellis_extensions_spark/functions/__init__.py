from .process_compiler import compile_process_graph, CompiledProcess

__all__ = ["compile_process_graph", "CompiledProcess"]
