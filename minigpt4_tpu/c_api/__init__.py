"""C ABI hosting: the embedded-Python side of libminigpt4.so."""
