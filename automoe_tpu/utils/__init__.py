from automoe_tpu.utils.jit_utils import enable_compile_cache, jit_init  # noqa: F401
