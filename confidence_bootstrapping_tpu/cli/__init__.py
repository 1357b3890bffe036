"""Command-line entry points (dock, infer, train, finetune)."""
