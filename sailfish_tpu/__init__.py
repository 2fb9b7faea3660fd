"""sailfish_tpu — a TPU-native, alignment-free RNA-seq transcript quantifier.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Sailfish
(kingsfordgroup/sailfish v0.10.0): quasi-mapping of reads against a
transcriptome suffix-array index, equivalence-class aggregation, and a
collapsed EM/VBEM optimizer with bootstrap / Gibbs posterior sampling.

Pipeline stages (mirroring reference src/Sailfish.cpp:154-158):
  * ``sailfish_tpu index`` — build the device-resident quasi-mapping index.
  * ``sailfish_tpu quant`` — stream FASTQ, quasi-map, build equivalence
    classes, run the collapsed EM, write quant.sf and aux outputs.

The compute path (mapping, eq-class collapse, EM) is JAX running on TPU;
host-side work (FASTQ decode, suffix-array construction, serialization)
has native C++ fast paths with pure-numpy fallbacks.
"""

__version__ = "0.1.0"

# Version of the on-disk index layout (analog of the reference's
# versionInfo.json indexVersion field, include/SailfishIndexVersionInfo.hpp).
INDEX_VERSION = 3
