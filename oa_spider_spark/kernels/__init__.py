"""Image kernels: pure-numpy reimplementations of the reference's captcha
pipeline (`/root/reference/oa_spider/captcha/captcha.py`), vectorized, plus
the codecs and Arrow-batch UDF stages that carry them into Spark plans.
"""
