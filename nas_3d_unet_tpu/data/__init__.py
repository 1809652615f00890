from .preprocess import preprocess_patient, preprocess_dataset, load_patient_h5  # noqa: F401
