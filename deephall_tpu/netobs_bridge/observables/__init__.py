"""netobs estimator plugins (require the external ``netobs`` package)."""
