def limit_arrow_threads(n: int = 1) -> None:
    """Pin pyarrow's process-global compute/IO thread pools.

    Ray schedules many single-CPU workers per node; pyarrow defaults its internal
    pool to os.cpu_count() *per process*, so K workers × N arrow threads
    oversubscribes the node K×N ways — measured ~15× per-doc slowdown and wild
    run-to-run variance in the parse stage. Every stage that runs vectorized
    arrow kernels calls this in its actor __init__ (or per task batch — it's an
    int store, effectively free)."""
    import pyarrow as pa

    try:
        if pa.cpu_count() != n:
            pa.set_cpu_count(n)
        if pa.io_thread_count() != 2:
            pa.set_io_thread_count(2)
    except Exception:
        pass