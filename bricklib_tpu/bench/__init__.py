from .timing import PhaseTimers, mpi_statistics, time_func, time_mpi

__all__ = ["PhaseTimers", "mpi_statistics", "time_func", "time_mpi"]
