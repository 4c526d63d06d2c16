"""Kernel compiler with diagnostics (the reference's ShaderCompiler analog).

The reference compiles WGSL -> naga IR -> validate -> SPIR-V and returns rich
errors instead of crashing the render loop (src/utils/shader_compiler.rs:
10-46, 98-160). The JAX analog: ``jax.jit(...).lower(...).compile()`` with
exceptions captured into a :class:`CompileResult` — the contract "compile
returns diagnostics, don't crash the loop" carries over (SURVEY.md H10).
"""

from __future__ import annotations

import time
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class CompileResult:
    """Outcome of a kernel compilation."""

    ok: bool
    compiled: Any = None  # the jitted/compiled callable on success
    error: str = ""  # diagnostics on failure (naga-style, multi-line)
    seconds: float = 0.0

    def __bool__(self):
        return self.ok


class KernelCompiler:
    """Compiles render functions ahead-of-time and reports diagnostics.

    ``create_kernel`` mirrors ShaderCompiler::create_shader_module
    (shader_compiler.rs:21-31): it takes a python callable + example args,
    lowers and compiles it, and returns a CompileResult rather than raising —
    parse/lowering errors (the naga Parser/Validator stages) and backend
    errors (the spv::Writer stage) both land in ``error``.
    """

    def __init__(self):
        self._cache: dict = {}

    def create_kernel(self, fn: Callable, example_args: tuple,
                      static_argnames=(), donate_argnums=()) -> CompileResult:
        import jax

        t0 = time.time()
        try:
            jitted = jax.jit(
                fn, static_argnames=static_argnames, donate_argnums=donate_argnums
            )
            lowered = jitted.lower(*example_args)
            compiled = lowered.compile()
            return CompileResult(True, compiled, "", time.time() - t0)
        except Exception:
            return CompileResult(False, None, traceback.format_exc(),
                                 time.time() - t0)

    def create_kernel_cached(self, key, fn, example_args, **kw) -> CompileResult:
        if key not in self._cache or not self._cache[key].ok:
            self._cache[key] = self.create_kernel(fn, example_args, **kw)
        return self._cache[key]
