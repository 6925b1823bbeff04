"""Pure-numpy sketch kernels. No Spark imports here — these run inside
Arrow-batched UDFs on executors and in plain unit tests."""
