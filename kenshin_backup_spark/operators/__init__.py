"""Engine operators (SURVEY.md §2).

Each module re-expresses one slice of the reference's operator surface (or a
driver-mandated extension) as idiomatic Spark DataFrame plans:

- ``rollup``     : §2.3 A1–A8 — downsample kernels, xFilesFactor, cascade
- ``policies``   : §3.3 — storage-schema regex first-match policy assignment
- ``fetch``      : §2.1 S5/S6, §2.5 W4 — archive routing, grid gap-fill
- ``windows``    : §2.5 W1–W3 — graphite-web style series functions
- ``joins``      : §2.4 J5/J6 — as-of and range joins
- ``dedup``      : §2.9 X1/X2 — exact + near-duplicate detection
- ``similarity`` : §2.9 X3 — vector top-k / ANN
- ``textops``    : §2.9 X5 — language id, quality, tokens, fingerprints
- ``multimodal`` : §2.9 X4 — binary payload + typed metadata plumbing
"""
