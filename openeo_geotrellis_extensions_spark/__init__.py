"""openeo_geotrellis_extensions_spark — a from-scratch PySpark-native spatial engine.

Re-implements the query/data-processing capabilities of
Open-EO/openeo-geotrellis-extensions (reference, read-only at /root/reference)
as idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst/AQE, with
Arrow-batched pandas UDFs for per-tile numpy work. No RDDs, no Py4J/JEP
bridges, no custom Catalyst rules — tiles are `binary` columns, geometry is
pure numpy, partitioning is explicit cell-key columns.

Layout:
    core/       grid & layout math, hierarchical cells, cell types, tiles, geometry
    sources/    interleaved-document table synthesis, datacube constructors
    operators/  openEO process analogs (aggregate_spatial, merge_cubes, mask, ...)
    functions/  openEO process-graph -> numpy closure compiler
    pipeline/   training-data ops (dedup, similarity, text quality, multimodal)
    sinks/      writers (csv timeseries, per-grid-cell tiff stubs, netcdf stubs)
    runtime/    session builder, checkpoint-resume manifest, metrics
    plans/      plan inspection helpers (pushdown/codegen asserts)
    streaming/  structured-streaming analogs (reference is batch-only)
"""

__version__ = "0.1.0"
