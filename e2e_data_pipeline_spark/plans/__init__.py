from e2e_data_pipeline_spark.plans.etl import EtlResult, main_flow

__all__ = ["EtlResult", "main_flow"]
