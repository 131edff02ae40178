"""Pipeline orchestration (SURVEY.md §2.10, §3).

The reference chains six OS processes through files
(docker-entrypoint.sh:4-10); here the same stages compose as lazy
DataFrame plans over an Experiment façade, with Parquet checkpoints
only at the stage boundaries the reference's restartability contract
requires.
"""

from data_ingest_spark.pipeline.experiment import (Experiment,
                                                   assemble_cells,
                                                   validate_experiment)
from data_ingest_spark.pipeline.steps import (STEPS, StepResult,
                                              derive_config_per_sample,
                                              run_qc)

__all__ = ["Experiment", "assemble_cells", "validate_experiment", "STEPS",
           "StepResult", "derive_config_per_sample", "run_qc"]
