"""ehr_data_pipeline_spark — a PySpark-native analytics engine.

Re-implements the capability surface of the ``Vanessaaaaa0202/EHR_Data_PipeLine``
reference (a single-machine pandas/Airflow FHIR ETL pipeline, see SURVEY.md)
as idiomatic Spark DataFrame plans, and extends it with relational analytics
and LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis). Every operator is designed for 100 TB scale: explicit schemas,
no Python UDFs on hot paths, broadcast-able dimension joins, shuffle-conscious
plans, AQE enabled.
"""

from ehr_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
