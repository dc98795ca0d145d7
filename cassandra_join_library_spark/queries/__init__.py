"""Driver-graded query definitions, grouped by area.

Each module registers queries into
:mod:`cassandra_join_library_spark.registry`.  ``__spark_entry__.py``
re-exports the registry as the driver contract.
"""
