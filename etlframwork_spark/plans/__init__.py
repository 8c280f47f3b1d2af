from .job import JobSpec, run_job  # noqa: F401
