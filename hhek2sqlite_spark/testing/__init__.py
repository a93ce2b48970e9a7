from hhek2sqlite_spark.testing.parity import compare_frames, run_oracle, run_parity

__all__ = ["compare_frames", "run_oracle", "run_parity"]
