/* Serial (single-rank) MPI implementation backing mpi.h in this directory.
 * See the header for purpose. Single-rank semantics throughout:
 *  - rank 0 of size 1; reductions/gathers/broadcasts are memcpys
 *  - point-to-point is a self-send FIFO matched on (tag), so code paths
 *    that send-to-self still work
 *  - MPI-IO maps to stdio; MPI_File_set_view records the etype size and
 *    subsequent seeks are in etype units (the only semantics the reference
 *    uses: set_view(0, T, T, "native") + seek in units of T)
 */
#include "mpi.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/stat.h>
#include <time.h>

static int g_initialized = 0;

/* ---------------- datatype table ---------------- */

#define MAX_USER_TYPES 256
static size_t g_user_type_size[MAX_USER_TYPES];
static int g_user_type_count = 0;

static size_t type_size(MPI_Datatype t)
{
    switch (t) {
    case MPI_CHAR:
    case MPI_BYTE:
	return 1;
    case MPI_INT:
    case MPI_UNSIGNED:
    case MPI_INT32_T:
    case MPI_UINT32_T:
	return 4;
    case MPI_UNSIGNED_LONG:
    case MPI_LONG:
	return sizeof(long);
    case MPI_DOUBLE:
	return 8;
    case MPI_FLOAT:
	return 4;
    case MPI_AINT:
	return sizeof(MPI_Aint);
    default:
	if (t >= 1 && t <= g_user_type_count)
	    return g_user_type_size[t - 1];
	return 0;
    }
}

static MPI_Datatype new_user_type(size_t size)
{
    if (g_user_type_count >= MAX_USER_TYPES) {
	fprintf(stderr, "mpi_stub: datatype table full\n");
	abort();
    }
    g_user_type_size[g_user_type_count++] = size;
    return (MPI_Datatype)g_user_type_count;
}

int MPI_Type_create_struct(int count, const int *bl, const MPI_Aint *disp,
			   const MPI_Datatype *types, MPI_Datatype *newtype)
{
    /* Extent = span from the smallest displacement to the end of the last
     * block, which for the reference's packed particle struct equals
     * sizeof(t_particle). */
    MPI_Aint lo = disp[0], hi = disp[0] + (MPI_Aint)(bl[0] * type_size(types[0]));
    for (int i = 1; i < count; ++i) {
	MPI_Aint end = disp[i] + (MPI_Aint)(bl[i] * type_size(types[i]));
	if (disp[i] < lo)
	    lo = disp[i];
	if (end > hi)
	    hi = end;
    }
    *newtype = new_user_type((size_t)(hi - lo));
    return MPI_SUCCESS;
}

int MPI_Type_indexed(int count, const int *bl, const int *disp,
		     MPI_Datatype oldtype, MPI_Datatype *newtype)
{
    size_t total = 0;
    (void)disp;
    for (int i = 0; i < count; ++i)
	total += (size_t)bl[i] * type_size(oldtype);
    *newtype = new_user_type(total);
    return MPI_SUCCESS;
}

int MPI_Type_contiguous(int count, MPI_Datatype oldtype, MPI_Datatype *newtype)
{
    *newtype = new_user_type((size_t)count * type_size(oldtype));
    return MPI_SUCCESS;
}

int MPI_Type_commit(MPI_Datatype *datatype)
{
    (void)datatype;
    return MPI_SUCCESS;
}

int MPI_Type_free(MPI_Datatype *datatype)
{
    *datatype = MPI_DATATYPE_NULL;
    return MPI_SUCCESS;
}

int MPI_Type_size(MPI_Datatype datatype, int *size)
{
    *size = (int)type_size(datatype);
    return MPI_SUCCESS;
}

int MPI_Get_address(const void *location, MPI_Aint *address)
{
    *address = (MPI_Aint)location;
    return MPI_SUCCESS;
}

/* ---------------- init / env ---------------- */

int MPI_Init(int *argc, char ***argv)
{
    (void)argc;
    (void)argv;
    g_initialized = 1;
    return MPI_SUCCESS;
}

int MPI_Init_thread(int *argc, char ***argv, int required, int *provided)
{
    if (provided)
	*provided = required;
    return MPI_Init(argc, argv);
}

int MPI_Initialized(int *flag)
{
    *flag = g_initialized;
    return MPI_SUCCESS;
}

int MPI_Finalize(void)
{
    g_initialized = 0;
    return MPI_SUCCESS;
}

int MPI_Abort(MPI_Comm comm, int errorcode)
{
    (void)comm;
    fprintf(stderr, "mpi_stub: MPI_Abort(%d)\n", errorcode);
    exit(errorcode ? errorcode : 1);
}

int MPI_Comm_rank(MPI_Comm comm, int *rank)
{
    (void)comm;
    *rank = 0;
    return MPI_SUCCESS;
}

int MPI_Comm_size(MPI_Comm comm, int *size)
{
    (void)comm;
    *size = 1;
    return MPI_SUCCESS;
}

int MPI_Get_processor_name(char *name, int *resultlen)
{
    const char *n = "serial-mpi-stub";
    strcpy(name, n);
    *resultlen = (int)strlen(n);
    return MPI_SUCCESS;
}

int MPI_Error_string(int errorcode, char *string, int *resultlen)
{
    int n = snprintf(string, MPI_MAX_ERROR_STRING, "mpi_stub error %d",
		     errorcode);
    *resultlen = n;
    return MPI_SUCCESS;
}

int MPI_Error_class(int errorcode, int *errorclass)
{
    *errorclass = errorcode;
    return MPI_SUCCESS;
}

int MPI_Barrier(MPI_Comm comm)
{
    (void)comm;
    return MPI_SUCCESS;
}

double MPI_Wtime(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

/* ---------------- collectives (size 1) ---------------- */

int MPI_Allreduce(const void *sendbuf, void *recvbuf, int count,
		  MPI_Datatype datatype, MPI_Op op, MPI_Comm comm)
{
    (void)op;
    (void)comm;
    if (sendbuf != MPI_IN_PLACE)
	memcpy(recvbuf, sendbuf, (size_t)count * type_size(datatype));
    return MPI_SUCCESS;
}

int MPI_Reduce(const void *sendbuf, void *recvbuf, int count,
	       MPI_Datatype datatype, MPI_Op op, int root, MPI_Comm comm)
{
    (void)root;
    return MPI_Allreduce(sendbuf, recvbuf, count, datatype, op, comm);
}

int MPI_Bcast(void *buffer, int count, MPI_Datatype datatype, int root,
	      MPI_Comm comm)
{
    (void)buffer;
    (void)count;
    (void)datatype;
    (void)root;
    (void)comm;
    return MPI_SUCCESS;
}

int MPI_Gather(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
	       void *recvbuf, int recvcount, MPI_Datatype recvtype, int root,
	       MPI_Comm comm)
{
    (void)recvcount;
    (void)recvtype;
    (void)root;
    (void)comm;
    if (sendbuf != MPI_IN_PLACE)
	memcpy(recvbuf, sendbuf, (size_t)sendcount * type_size(sendtype));
    return MPI_SUCCESS;
}

int MPI_Allgather(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
		  void *recvbuf, int recvcount, MPI_Datatype recvtype,
		  MPI_Comm comm)
{
    return MPI_Gather(sendbuf, sendcount, sendtype, recvbuf, recvcount,
		      recvtype, 0, comm);
}

int MPI_Gatherv(const void *sendbuf, int sendcount, MPI_Datatype sendtype,
		void *recvbuf, const int *recvcounts, const int *displs,
		MPI_Datatype recvtype, int root, MPI_Comm comm)
{
    (void)recvcounts;
    (void)root;
    (void)comm;
    if (sendbuf != MPI_IN_PLACE)
	memcpy((char *)recvbuf + (size_t)displs[0] * type_size(recvtype),
	       sendbuf, (size_t)sendcount * type_size(sendtype));
    return MPI_SUCCESS;
}

/* ---------------- point-to-point: self-send FIFO ---------------- */

typedef struct Msg {
    int tag;
    size_t bytes;
    char *data;
    struct Msg *next;
} Msg;

static Msg *g_queue_head = NULL, *g_queue_tail = NULL;

/* Pending nonblocking receives: completed at MPI_Wait time. */
#define MAX_PENDING 1024
typedef struct Pending {
    int is_recv;
    void *buf;
    size_t max_bytes;
    int tag;
    int active;
    size_t got_bytes;
} Pending;
static Pending g_pending[MAX_PENDING];
static int g_pending_count = 0;

static void enqueue_msg(const void *buf, size_t bytes, int tag)
{
    Msg *m = (Msg *)malloc(sizeof(Msg));
    m->tag = tag;
    m->bytes = bytes;
    m->data = (char *)malloc(bytes ? bytes : 1);
    memcpy(m->data, buf, bytes);
    m->next = NULL;
    if (g_queue_tail)
	g_queue_tail->next = m;
    else
	g_queue_head = m;
    g_queue_tail = m;
}

static Msg *find_msg(int tag, Msg ***prev_link_out)
{
    Msg **link = &g_queue_head;
    while (*link) {
	if (tag == MPI_ANY_TAG || (*link)->tag == tag) {
	    *prev_link_out = link;
	    return *link;
	}
	link = &(*link)->next;
    }
    return NULL;
}

static size_t dequeue_msg(void *buf, size_t max_bytes, int tag)
{
    Msg **link;
    Msg *m = find_msg(tag, &link);
    if (!m) {
	fprintf(stderr,
		"mpi_stub: blocking receive with no matching self-send "
		"(tag %d) — would deadlock on 1 rank\n",
		tag);
	abort();
    }
    size_t n = m->bytes < max_bytes ? m->bytes : max_bytes;
    memcpy(buf, m->data, n);
    *link = m->next;
    g_queue_tail = g_queue_head;
    if (g_queue_tail)
	while (g_queue_tail->next)
	    g_queue_tail = g_queue_tail->next;
    free(m->data);
    free(m);
    return n;
}

int MPI_Send(const void *buf, int count, MPI_Datatype datatype, int dest,
	     int tag, MPI_Comm comm)
{
    (void)comm;
    if (dest == MPI_PROC_NULL)
	return MPI_SUCCESS;
    enqueue_msg(buf, (size_t)count * type_size(datatype), tag);
    return MPI_SUCCESS;
}

int MPI_Ssend(const void *buf, int count, MPI_Datatype datatype, int dest,
	      int tag, MPI_Comm comm)
{
    return MPI_Send(buf, count, datatype, dest, tag, comm);
}

int MPI_Recv(void *buf, int count, MPI_Datatype datatype, int source, int tag,
	     MPI_Comm comm, MPI_Status *status)
{
    (void)comm;
    if (source == MPI_PROC_NULL)
	return MPI_SUCCESS;
    size_t got = dequeue_msg(buf, (size_t)count * type_size(datatype), tag);
    if (status) {
	status->MPI_SOURCE = 0;
	status->MPI_TAG = tag;
	status->MPI_ERROR = MPI_SUCCESS;
	status->_count_bytes = got;
    }
    return MPI_SUCCESS;
}

int MPI_Isend(const void *buf, int count, MPI_Datatype datatype, int dest,
	      int tag, MPI_Comm comm, MPI_Request *request)
{
    int rc = MPI_Send(buf, count, datatype, dest, tag, comm);
    if (g_pending_count >= MAX_PENDING) {
	fprintf(stderr, "mpi_stub: pending-request table full\n");
	abort();
    }
    g_pending[g_pending_count] = (Pending){0, NULL, 0, tag, 1, 0};
    *request = g_pending_count + 1;
    ++g_pending_count;
    return rc;
}

int MPI_Irecv(void *buf, int count, MPI_Datatype datatype, int source,
	      int tag, MPI_Comm comm, MPI_Request *request)
{
    (void)comm;
    (void)source;
    if (g_pending_count >= MAX_PENDING) {
	fprintf(stderr, "mpi_stub: pending-request table full\n");
	abort();
    }
    g_pending[g_pending_count] =
	(Pending){1, buf, (size_t)count * type_size(datatype), tag, 1, 0};
    *request = g_pending_count + 1;
    ++g_pending_count;
    return MPI_SUCCESS;
}

int MPI_Wait(MPI_Request *request, MPI_Status *status)
{
    if (*request == MPI_REQUEST_NULL)
	return MPI_SUCCESS;
    Pending *p = &g_pending[*request - 1];
    if (p->active && p->is_recv)
	p->got_bytes = dequeue_msg(p->buf, p->max_bytes, p->tag);
    p->active = 0;
    if (status) {
	status->MPI_SOURCE = 0;
	status->MPI_TAG = p->tag;
	status->MPI_ERROR = MPI_SUCCESS;
	status->_count_bytes = p->got_bytes;
    }
    *request = MPI_REQUEST_NULL;
    /* Reclaim the table when everything is done. */
    int any = 0;
    for (int i = 0; i < g_pending_count; ++i)
	any |= g_pending[i].active;
    if (!any)
	g_pending_count = 0;
    return MPI_SUCCESS;
}

int MPI_Probe(int source, int tag, MPI_Comm comm, MPI_Status *status)
{
    (void)source;
    (void)comm;
    Msg **link;
    Msg *m = find_msg(tag, &link);
    if (!m) {
	fprintf(stderr, "mpi_stub: MPI_Probe with empty queue (tag %d)\n",
		tag);
	abort();
    }
    if (status) {
	status->MPI_SOURCE = 0;
	status->MPI_TAG = m->tag;
	status->MPI_ERROR = MPI_SUCCESS;
	status->_count_bytes = m->bytes;
    }
    return MPI_SUCCESS;
}

int MPI_Get_count(const MPI_Status *status, MPI_Datatype datatype, int *count)
{
    size_t ts = type_size(datatype);
    *count = ts ? (int)(status->_count_bytes / ts) : 0;
    return MPI_SUCCESS;
}

/* ---------------- MPI-IO over stdio ---------------- */

struct _MPI_FileImpl {
    FILE *fp;
    size_t etype_size; /* seek unit set by MPI_File_set_view */
    long long disp;    /* view displacement in bytes */
};

int MPI_File_open(MPI_Comm comm, const char *filename, int amode,
		  MPI_Info info, MPI_File *fh)
{
    (void)comm;
    (void)info;
    const char *mode;
    if (amode & MPI_MODE_RDONLY)
	mode = "rb";
    else if (amode & MPI_MODE_APPEND)
	mode = "ab";
    else if (amode & MPI_MODE_CREATE)
	mode = "wb";
    else
	mode = "r+b"; /* WRONLY without CREATE: update existing */
    FILE *fp = fopen(filename, mode);
    if (!fp && (amode & MPI_MODE_WRONLY) && !(amode & MPI_MODE_CREATE))
	fp = fopen(filename, "wb");
    if (!fp) {
	*fh = MPI_FILE_NULL;
	return MPI_ERR_NO_SUCH_FILE;
    }
    struct _MPI_FileImpl *impl =
	(struct _MPI_FileImpl *)malloc(sizeof(struct _MPI_FileImpl));
    impl->fp = fp;
    impl->etype_size = 1;
    impl->disp = 0;
    *fh = impl;
    return MPI_SUCCESS;
}

int MPI_File_close(MPI_File *fh)
{
    if (*fh) {
	fclose((*fh)->fp);
	free(*fh);
	*fh = MPI_FILE_NULL;
    }
    return MPI_SUCCESS;
}

int MPI_File_set_view(MPI_File fh, MPI_Offset disp, MPI_Datatype etype,
		      MPI_Datatype filetype, const char *datarep,
		      MPI_Info info)
{
    (void)filetype;
    (void)datarep;
    (void)info;
    fh->etype_size = type_size(etype);
    fh->disp = disp;
    fseek(fh->fp, (long)disp, SEEK_SET);
    return MPI_SUCCESS;
}

int MPI_File_seek(MPI_File fh, MPI_Offset offset, int whence)
{
    long long byte_off = offset * (long long)fh->etype_size;
    if (whence == MPI_SEEK_SET)
	fseek(fh->fp, (long)(fh->disp + byte_off), SEEK_SET);
    else if (whence == MPI_SEEK_CUR)
	fseek(fh->fp, (long)byte_off, SEEK_CUR);
    else
	fseek(fh->fp, (long)byte_off, SEEK_END);
    return MPI_SUCCESS;
}

int MPI_File_get_size(MPI_File fh, MPI_Offset *size)
{
    long cur = ftell(fh->fp);
    fseek(fh->fp, 0, SEEK_END);
    *size = (MPI_Offset)ftell(fh->fp);
    fseek(fh->fp, cur, SEEK_SET);
    return MPI_SUCCESS;
}

int MPI_File_write(MPI_File fh, const void *buf, int count,
		   MPI_Datatype datatype, MPI_Status *status)
{
    size_t n = fwrite(buf, type_size(datatype), (size_t)count, fh->fp);
    if (status)
	status->_count_bytes = n * type_size(datatype);
    return n == (size_t)count ? MPI_SUCCESS : MPI_ERR_OTHER;
}

int MPI_File_write_all(MPI_File fh, const void *buf, int count,
		       MPI_Datatype datatype, MPI_Status *status)
{
    return MPI_File_write(fh, buf, count, datatype, status);
}

int MPI_File_read(MPI_File fh, void *buf, int count, MPI_Datatype datatype,
		  MPI_Status *status)
{
    size_t n = fread(buf, type_size(datatype), (size_t)count, fh->fp);
    if (status)
	status->_count_bytes = n * type_size(datatype);
    return MPI_SUCCESS;
}

int MPI_File_read_all(MPI_File fh, void *buf, int count,
		      MPI_Datatype datatype, MPI_Status *status)
{
    return MPI_File_read(fh, buf, count, datatype, status);
}
